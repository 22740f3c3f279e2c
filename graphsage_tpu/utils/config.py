"""Configuration: HOCON-lite parser + flat dotted-key access.

The reference uses pyhocon to parse ``src/experiments.conf``
(reference src/main.py:46) and reads keys stringly:
``config['setting.num_layers']``, ``config['file_path.cora_content']``
(src/main.py:54,58; src/dataCenter.py:15-16,55-56).  pyhocon is not in the
baked environment, so this module implements the small HOCON subset the
reference's config actually uses — nested ``name { ... }`` blocks,
``key = value`` pairs, ``${path.to.key}`` substitution, comments — and
exposes the same dotted-key lookup surface, so existing experiment files
parse unchanged.
"""

from __future__ import annotations

import re


class Config:
    """Flat dotted-key config with reference-compatible item access."""

    def __init__(self, values: dict[str, object]):
        self._values = dict(values)

    def __getitem__(self, key: str):
        return self._values[key]

    def get(self, key: str, default=None):
        return self._values.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self._values

    def keys(self):
        return self._values.keys()

    def __repr__(self):
        return f"Config({self._values!r})"


_SUBST = re.compile(r"\$\{([^}]+)\}")


def _coerce(raw: str):
    raw = raw.strip()
    if raw and raw[0] in "\"'" and raw[-1] == raw[0] and len(raw) >= 2:
        return raw[1:-1]
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def parse_hocon(text: str) -> Config:
    values: dict[str, object] = {}
    stack: list[str] = []
    for lineno, line in enumerate(text.splitlines(), 1):
        line = line.split("//")[0].split("#")[0].strip()
        if not line:
            continue
        if line.endswith("{"):
            stack.append(line[:-1].strip())
            continue
        if line == "}":
            if not stack:
                raise ValueError(f"line {lineno}: unmatched '}}'")
            stack.pop()
            continue
        if "=" in line:
            key, raw = line.split("=", 1)
            full_key = ".".join(stack + [key.strip()])
            values[full_key] = raw.strip()
            continue
        raise ValueError(f"line {lineno}: cannot parse {line!r}")
    if stack:
        raise ValueError(f"unclosed block {'.'.join(stack)!r}")

    # resolve ${a.b} substitutions (strings concatenate, HOCON-style),
    # iterating to handle chains
    for _ in range(10):
        changed = False
        for k, v in values.items():
            if not isinstance(v, str) or "${" not in v:
                continue

            def repl(m):
                ref = m.group(1).strip()
                rv = values.get(ref)
                return "" if rv is None else str(rv)

            new = _SUBST.sub(repl, v)
            if new != v:
                values[k] = new
                changed = True
        if not changed:
            break

    return Config({k: (_coerce(v) if isinstance(v, str) else v)
                   for k, v in values.items()})


def load_config(path: str) -> Config:
    with open(path) as fp:
        return parse_hocon(fp.read())
