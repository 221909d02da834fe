"""Config validation with actionable errors.

The reference parses YAML into an EasyDict and fails deep inside the stack
when a key is missing or a geometry is incompatible (SURVEY.md §5.6).  Here
the CLI layer validates up front: required sections, value sanity, and the
shape-divisibility rules each architecture imposes (UNet halving levels, DiT
patch sizes).  Returns a list of problems so callers can report them all at
once.
"""

from __future__ import annotations

from crowdmod_tpu.config.frozen import FrozenConfig

REQUIRED_SECTIONS = ("DATA_FS", "MACROPROPS", "DATASET", "MODEL", "METRICS")

SAMPLERS = ("DDPM", "DDIM", "DPM-Solver")
GUIDANCE = ("None", "Sparsity", "mass_preservation")


def _positive(cfg, path, problems, kind=int):
    v = cfg.get_path(path)
    if v is None:
        problems.append(f"{path} is missing")
    elif not isinstance(v, kind) or isinstance(v, bool) or v <= 0:
        problems.append(f"{path} must be a positive {kind.__name__}, got {v!r}")


def validate_config(cfg: FrozenConfig, arch: str | None = None) -> list[str]:
    """→ list of human-readable problems (empty = valid)."""
    problems: list[str] = []
    for section in REQUIRED_SECTIONS:
        if section not in cfg:
            problems.append(
                f"missing top-level section {section} "
                f"(see configs/ATC.yml for the schema)"
            )
    if problems:
        return problems

    for path in ("MACROPROPS.ROWS", "MACROPROPS.COLS", "MACROPROPS.STRIDE",
                 "DATASET.PAST_LEN", "DATASET.FUTURE_LEN",
                 "DATASET.BATCH_SIZE", "DATASET.RAW_SEQ_LEN"):
        _positive(cfg, path, problems)

    h, w = cfg.get_path("MACROPROPS.ROWS"), cfg.get_path("MACROPROPS.COLS")
    p_len = cfg.get_path("DATASET.PAST_LEN")
    f_len = cfg.get_path("DATASET.FUTURE_LEN")
    raw = cfg.get_path("DATASET.RAW_SEQ_LEN")
    if raw and p_len and f_len and raw < p_len + f_len:
        problems.append(
            f"DATASET.RAW_SEQ_LEN ({raw}) shorter than "
            f"PAST_LEN+FUTURE_LEN ({p_len}+{f_len})"
        )

    ddpm = cfg.get_path("MODEL.DDPM")
    if ddpm is not None:
        sampler = ddpm.get("SAMPLER")
        if sampler is not None and sampler not in SAMPLERS:
            problems.append(
                f"MODEL.DDPM.SAMPLER {sampler!r} unknown; expected {SAMPLERS}"
            )
        guid = ddpm.get("GUIDANCE")
        if guid is not None and guid not in GUIDANCE:
            problems.append(
                f"MODEL.DDPM.GUIDANCE {guid!r} unknown; expected {GUIDANCE}"
            )
        ts = ddpm.get("TIMESTEPS")
        if ts is not None and (not isinstance(ts, int) or ts < 1):
            problems.append(f"MODEL.DDPM.TIMESTEPS must be >= 1, got {ts!r}")

    # Architecture-specific geometry rules.
    def check_dit(node, label):
        if node is None:
            return
        ps = node.get("PATCH_SIZE")
        tps = node.get("T_PATCH_SIZE")
        if ps and h and w and (h % ps or w % ps):
            problems.append(
                f"{label}: grid {h}x{w} not divisible by PATCH_SIZE {ps}"
            )
        total = (p_len or 0) + (f_len or 0)
        if tps and total and total % tps:
            problems.append(
                f"{label}: PAST+FUTURE ({total}) not divisible by "
                f"T_PATCH_SIZE {tps}"
            )
        hs, heads = node.get("HIDDEN_SIZE"), node.get("NUM_HEADS")
        if hs and heads and hs % heads:
            problems.append(
                f"{label}: HIDDEN_SIZE {hs} not divisible by NUM_HEADS {heads}"
            )

    def check_unet(node, label):
        if node is None:
            return
        mult = node.get("BASE_CH_MULT")
        if not mult:
            return
        levels = len(mult)
        total_t = (p_len or 0) + (f_len or 0)
        for dim, name in ((h, "ROWS"), (w, "COLS"), (total_t, "PAST+FUTURE")):
            if dim and dim % (2 ** (levels - 1)):
                problems.append(
                    f"{label}: {name} ({dim}) must be divisible by "
                    f"2^(levels-1) = {2 ** (levels - 1)} for {levels} "
                    f"resolution levels"
                )

    archs = {
        "DDPM-UNet": lambda: check_unet(cfg.get_path("MODEL.DDPM.UNET"), "MODEL.DDPM.UNET"),
        "DDPM-DiT": lambda: check_dit(cfg.get_path("MODEL.DDPM.DIT"), "MODEL.DDPM.DIT"),
        "FM-UNet": lambda: check_unet(cfg.get_path("MODEL.FM.UNET"), "MODEL.FM.UNET"),
        "FM-DiT": lambda: check_dit(cfg.get_path("MODEL.FM.DIT"), "MODEL.FM.DIT"),
        "ConvRNN": lambda: None,
    }
    if arch is not None:
        if arch not in archs:
            problems.append(f"unknown arch {arch!r}; expected {list(archs)}")
        else:
            archs[arch]()
    else:
        for fn in archs.values():
            fn()
    return problems


def require_valid(cfg: FrozenConfig, arch: str | None = None) -> None:
    """Raise ValueError listing every problem (CLI entry-point guard)."""
    problems = validate_config(cfg, arch)
    if problems:
        raise ValueError(
            "invalid configuration:\n  - " + "\n  - ".join(problems)
        )
