"""Java-style .properties config parsing (SURVEY.md S13 parity).

The reference's KGE trainers read hyperparameters from a
``*.properties`` file (`KGE/src/approaches/TransE.java:118-131`;
template at `KGE_config_template.properties`): ``KEY=VALUE`` lines with
``${VAR}`` placeholders substituted from the environment by the shell
driver (`compute_embeddings.sh`).  This module reproduces that surface
so a reference user can point their existing config at the CLI
(``python -m ttmf_ray.run trust --config FB15K_Config.properties``).
"""

from __future__ import annotations

import os
import re

from .transe import TransEConfig

_PLACEHOLDER = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def parse_properties(path: str) -> dict[str, str]:
    """KEY=VALUE lines → dict; '#'/'!' comments and blanks skipped;
    ``${VAR}`` resolved from the environment (empty when unset — the
    same effect as the reference's envsubst-style shell expansion)."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")) or "=" not in line:
                continue
            key, _, val = line.partition("=")
            props[key.strip()] = _PLACEHOLDER.sub(
                lambda m: os.environ.get(m.group(1), ""), val.strip())
    return props


# properties key → (TransEConfig field, parser) — TransE.java:125-131 +
# PTransE.java NEG_SAMPLE_COUNT/BIAS
_KGE_KEYS = {
    "DIMENSION": ("dim", int),
    "EPOCHES": ("epochs", int),
    "MARGIN": ("margin", float),
    "STEP_SIZE": ("lr", float),
    "NEG_SAMPLE_COUNT": ("neg_per_pos", int),
    "BIAS": ("bias", float),
}


def transe_config_from_properties(props: dict[str, str] | str,
                                  loss: str = "margin") -> TransEConfig:
    """Map reference property keys onto :class:`TransEConfig`.

    Unknown keys (file paths, MU) are ignored — they configure the
    reference's file plumbing / dead approaches, not the trainer math.
    ``NORM`` other than L2 is rejected (the rebuild implements the L2
    energy only, like the reference's live configs).
    """
    if isinstance(props, str):
        props = parse_properties(props)
    norm = props.get("NORM", "L2").upper()
    if norm != "L2":
        raise ValueError(f"unsupported NORM={norm!r} (reference live "
                         "configs use L2)")
    kw: dict = {"loss": loss}
    for key, (field, cast) in _KGE_KEYS.items():
        if key in props and props[key] != "":
            kw[field] = cast(props[key])
    return TransEConfig(**kw)
