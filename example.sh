#!/bin/bash
# Reference example.sh equivalent (reference example.sh:1-5): 50-epoch
# unsupervised training on Cora with the normal negative-sampling loss.
python -m graphsage_tpu.cli --dataSet cora --epochs 50 --learn_method unsup --unsup_loss normal --b_sz 20 --seed 824 "$@"
