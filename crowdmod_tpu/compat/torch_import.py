"""Import reference torch checkpoints into crowdmod_tpu param pytrees.

The reference saves ``torch.save({"opt": ..., "model": state_dict})``
(reference utils/utils.py:140-147) and restores via
``torch.load(...)["model"]`` (reference models/diffusion/ddpm.py:288).
This module maps those flat state_dict tensors onto our flax param trees so
a reference user's *trained* models carry over without retraining:

    crowdmod import-checkpoint --arch DDPM-DiT --torch-ckpt model.pt ...

Every layout transform here (conv kernel transposes, fused-QKV splits, the
DiT FinalLayer feature permutation, the ConvGRU gate fusion, the
ConvTranspose flip) mirrors a parity-test mapper in
``tests/test_*_torch_parity.py``, where it is proven exact against the live
reference modules.  Here the same maps are re-expressed over state_dict
*keys and shapes only*, so importing a checkpoint needs neither the
reference sources on ``sys.path`` nor its config — just the file.

All transforms are pure numpy; no JAX backend is touched until the caller
materializes the tree.  Keys are consumed as they are mapped and any
unrecognized leftover raises — a checkpoint from a diverged reference fork
fails loudly instead of silently importing a partial model.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "detect_backbone",
    "import_torch_checkpoint",
    "verify_tree_matches",
    "BACKBONE_FOR_ARCH",
]

# Reference arch → backbone its wrapper instantiates
# (reference models/diffusion/ddpm.py:74-108, flow_matching.py:58-88,
# convRNN/convRNN.py:22-60).
BACKBONE_FOR_ARCH = {
    "DDPM-UNet": "unet3d",
    "FM-UNet": "unet3d",
    "DDPM-DiT": "dit4d_factorized",
    "FM-DiT": "dit2d",
    "ConvRNN": "convrnn",
}


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a reference checkpoint file → flat {key: float32 ndarray}.

    Accepts both the reference's ``{"opt": ..., "model": sd}`` wrapper and a
    bare state_dict.  torch is imported lazily: it is needed only to
    deserialize the pickle, never to run anything.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if not (isinstance(obj, dict)
            and all(hasattr(v, "detach") for v in obj.values())):
        raise ValueError(
            f"{path} is not a reference checkpoint: expected a state_dict "
            "or {'opt': ..., 'model': state_dict}"
        )
    return {k: np.asarray(v.detach().numpy()) for k, v in obj.items()}


def detect_backbone(sd: dict[str, np.ndarray]) -> str:
    """Fingerprint the backbone family from state_dict keys alone."""
    if any(k.startswith("encoder.encoder_cell_list.") for k in sd):
        return "convrnn"
    if "blocks.0.spatial_attn.in_proj_weight" in sd:
        return "dit4d_factorized"  # DiT4D_V4: per-block spatial+temporal attn
    if "blocks.0.attn.in_proj_weight" in sd:
        if sd["patch_embed.proj.weight"].ndim == 4:
            return "dit2d"  # per-frame Conv2d patchify (V1)
        # V2 (full tube) has a single temporal slot and no temporal embed;
        # V3 (partial tube, joint attention) learns one per slot.
        return "dit4d_joint" if "temporal_pos_embed" in sd else "dit4d_tube"
    if "first.weight" in sd:
        return "unet3d"
    raise ValueError(
        "unrecognized state_dict: not a reference UNet/DiT/ConvRNN "
        f"(sample keys: {sorted(sd)[:5]})"
    )


def import_torch_checkpoint(path: str, arch: str | None = None) -> dict:
    """File path → ``{"params": tree}`` ready for ``Trainer.load``-style use.

    When ``arch`` is given, the detected backbone must be the one that arch
    instantiates in the reference — mixing up e.g. an FM-DiT (DiT2D)
    checkpoint with ``--arch DDPM-DiT`` (DiT4D_V4) raises before any
    structure check.
    """
    sd = load_torch_state_dict(path)
    kind = detect_backbone(sd)
    if arch is not None:
        want = BACKBONE_FOR_ARCH.get(arch)
        if want is None:
            raise ValueError(f"unknown arch {arch!r}; "
                             f"expected one of {sorted(BACKBONE_FOR_ARCH)}")
        if want != kind:
            raise ValueError(
                f"checkpoint contains a {kind} backbone but --arch {arch} "
                f"expects {want}"
            )
    importer = {
        "unet3d": _import_unet3d,
        "dit2d": _import_dit2d,
        "dit4d_tube": _import_dit4d_tube,
        "dit4d_joint": _import_dit4d_joint,
        "dit4d_factorized": _import_dit4d_factorized,
        "convrnn": _import_convrnn,
    }[kind]
    tracked = _Tracked(sd)
    params = importer(tracked)
    tracked.finish()
    return {"params": params}


def verify_tree_matches(mapped: dict, template) -> None:
    """Raise with a readable diff unless ``mapped`` has exactly the leaf
    paths and shapes of ``template`` (a freshly initialized param tree)."""
    import jax

    def _paths(tree):
        return {
            jax.tree_util.keystr(k): tuple(np.shape(v))
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    got, want = _paths(mapped), _paths(template)
    problems = []
    if set(got) != set(want):
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        if missing:
            problems.append(f"missing params: {missing}")
        if extra:
            problems.append(f"unexpected params: {extra}")
    shape_diff = [
        f"{k}: checkpoint {got[k]} vs model {want[k]}"
        for k in sorted(set(got) & set(want)) if got[k] != want[k]
    ]
    if shape_diff:
        problems.append("shape mismatches: " + "; ".join(shape_diff))
    if problems:
        raise ValueError(
            "imported checkpoint does not fit the configured model "
            "(check --config/--arch match the torch training run):\n  "
            + "\n  ".join(problems)
        )


# ---------------------------------------------------------------------------
# key bookkeeping

# Deterministic buffers the reference stores but we recompute: the
# sinusoidal time-embedding table (nn.Embedding.from_pretrained,
# reference models/backbones/embeddings.py).
_IGNORABLE = re.compile(r"(^|\.)time_blocks\.0\.weight$")


class _Tracked:
    """State_dict view that records which keys each importer consumed."""

    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = sd
        self.used: set[str] = set()

    def __getitem__(self, k: str) -> np.ndarray:
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k: str) -> bool:
        return k in self.sd

    def keys(self):
        return self.sd.keys()

    def indices(self, list_name: str) -> list[int]:
        """Sorted child indices of a ModuleList, e.g. 'encoder_blocks'."""
        depth = list_name.count(".") + 1
        found = {
            int(k.split(".")[depth])
            for k in self.sd if k.startswith(list_name + ".")
        }
        return sorted(found)

    def finish(self) -> None:
        leftover = [
            k for k in self.sd
            if k not in self.used and not _IGNORABLE.search(k)
        ]
        if leftover:
            raise ValueError(
                "state_dict keys the importer does not understand "
                f"(diverged reference layout?): {sorted(leftover)}"
            )


# ---------------------------------------------------------------------------
# shared tensor transforms (each mirrors a proven parity-test mapper)

def _dense(sd, p):  # torch Linear (O, I) → flax Dense
    return {"kernel": sd[f"{p}.weight"].T.copy(), "bias": sd[f"{p}.bias"]}


def _gn(sd, p):  # torch GroupNorm → our GroupNormSiLU
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _conv3d(sd, p, bias=True):  # (O, I, kh, kw, kl) → (kl, kh, kw, I, O)
    out = {"kernel": np.ascontiguousarray(
        sd[f"{p}.weight"].transpose(4, 2, 3, 1, 0))}
    if bias and f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv2d(sd, p):  # (O, I, kh, kw) → (kh, kw, I, O)
    out = {"kernel": np.ascontiguousarray(
        sd[f"{p}.weight"].transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _convT2d(sd, p):
    """torch ConvTranspose2d (I, O, kh, kw) → flax nn.ConvTranspose kernel
    (kh, kw, I, O), spatially flipped (exactness proven in
    tests/test_fm_convrnn_protocol_parity.py::_convT_w)."""
    w = sd[f"{p}.weight"]
    out = {"kernel": np.ascontiguousarray(
        w.transpose(2, 3, 0, 1)[::-1, ::-1])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _mha(sd, p):
    """torch nn.MultiheadAttention fused in_proj → our q/k/v/out Denses."""
    w, b = sd[f"{p}.in_proj_weight"], sd[f"{p}.in_proj_bias"]
    d = w.shape[1]
    return {
        "query": {"kernel": w[:d].T.copy(), "bias": b[:d]},
        "key": {"kernel": w[d:2 * d].T.copy(), "bias": b[d:2 * d]},
        "value": {"kernel": w[2 * d:].T.copy(), "bias": b[2 * d:]},
        "out": {"kernel": sd[f"{p}.out_proj.weight"].T.copy(),
                "bias": sd[f"{p}.out_proj.bias"]},
    }


# ---------------------------------------------------------------------------
# UNet3D (reference models/backbones/unet.py, layers.py)

def _resblock(sd, p):
    out = {
        "GroupNormSiLU_0": _gn(sd, f"{p}.normalize_1"),
        "conv1": _conv3d(sd, f"{p}.conv_1"),
        "time_dense": _dense(sd, f"{p}.dense_1"),
        "GroupNormSiLU_1": _gn(sd, f"{p}.normalize_2"),
        "conv2": _conv3d(sd, f"{p}.conv_2"),
    }
    if f"{p}.match_input.weight" in sd:  # nn.Identity when channels match
        out["match_input"] = _conv3d(sd, f"{p}.match_input")
    if f"{p}.attention.group_norm.weight" in sd:  # nn.Identity when off
        out["SpatialAttentionBlock_0"] = {
            "GroupNormSiLU_0": _gn(sd, f"{p}.attention.group_norm"),
            "MultiHeadAttention_0": _mha(sd, f"{p}.attention.mhsa"),
        }
    return out


def _import_unet3d(sd) -> dict:
    """Structure is recovered from the keys alone: the reference interleaves
    ResnetBlocks and DownSamples in one ModuleList (unet.py:42-76), so the
    level/index counters advance exactly as in the flax module's naming."""
    params = {
        "TimestepEmbedding_0": {
            "expand": _dense(sd, "time_embeddings.time_blocks.1"),
            "project": _dense(sd, "time_embeddings.time_blocks.3"),
        },
        "first": _conv3d(sd, "first"),
    }
    level = i = 0
    for n in sd.indices("encoder_blocks"):
        p = f"encoder_blocks.{n}"
        if f"{p}.downsample.weight" in sd:
            params[f"down_{level}"] = {"Conv_0": _conv3d(sd, f"{p}.downsample")}
            level, i = level + 1, 0
        else:
            params[f"enc_{level}_{i}"] = _resblock(sd, p)
            i += 1
    params["mid_0"] = _resblock(sd, "bottleneck_blocks.0")
    params["mid_1"] = _resblock(sd, "bottleneck_blocks.1")
    level, i = level, 0  # decoder starts at the deepest level
    for n in sd.indices("decoder_blocks"):
        p = f"decoder_blocks.{n}"
        if f"{p}.upsample.1.weight" in sd:
            params[f"up_{level}"] = {
                "Conv3DSame_0": _conv3d(sd, f"{p}.upsample.1")
            }
            level, i = level - 1, 0
        else:
            params[f"dec_{level}_{i}"] = _resblock(sd, p)
            i += 1
    params["final_norm"] = _gn(sd, "final.0")
    params["final_conv"] = _conv3d(sd, "final.2")
    return params


# ---------------------------------------------------------------------------
# DiT family (reference models/backbones/DiT2D.py / DiT4D*.py)

def _time_prefix(sd) -> str:
    # V3/V4 call it dif_time_embeddings; V1/V2 time_embeddings.
    return ("dif_time_embeddings"
            if "dif_time_embeddings.time_blocks.1.weight" in sd
            else "time_embeddings")


def _dit_common(sd, patch_kernel) -> dict:
    tp = _time_prefix(sd)
    return {
        "time_emb": {
            "expand": _dense(sd, f"{tp}.time_blocks.1"),
            "project": _dense(sd, f"{tp}.time_blocks.3"),
        },
        "time_proj": _dense(sd, "time_proj.0"),
        "patch_embed": {"Conv_0": {
            "kernel": patch_kernel,
            "bias": sd["patch_embed.proj.bias"],
        }},
        # theirs (1, N_s, D) → ours (1, 1, N_s, D)
        "spatial_pos_embed": sd["spatial_pos_embed"][:, None],
    }


def _dit_final(sd, perm) -> dict:
    """FinalLayer with the feature-order permutation: their token features
    are channel-major (…, C, p, p), ours channel-minor (…, p, p, C)."""
    fin_w = sd["final_layer.linear.weight"]  # (out, hidden)
    fin_b = sd["final_layer.linear.bias"]
    return {
        "AdaLNModulation_0": {
            "Dense_0": _dense(sd, "final_layer.adaLN_modulation.1")
        },
        "Dense_0": {"kernel": fin_w.T[:, perm].copy(),
                    "bias": fin_b[perm].copy()},
    }


def _dit_block_joint(sd, p) -> dict:
    return {
        "AdaLNModulation_0": {"Dense_0": _dense(sd, f"{p}.adaLN_modulation.1")},
        "MultiHeadAttention_0": _mha(sd, f"{p}.attn"),
        "Mlp_0": {"Dense_0": _dense(sd, f"{p}.mlp.0"),
                  "Dense_1": _dense(sd, f"{p}.mlp.3")},
    }


def _import_dit2d(sd) -> dict:
    pe_w = sd["patch_embed.proj.weight"]  # Conv2d (D, C, p, p)
    _, c, p_sz, _ = pe_w.shape
    kernel = np.ascontiguousarray(pe_w.transpose(2, 3, 1, 0))[None]
    perm = (np.arange(c * p_sz * p_sz).reshape(c, p_sz, p_sz)
            .transpose(1, 2, 0).reshape(-1))
    params = _dit_common(sd, kernel)
    # theirs (1, t_max, D) → ours (1, t_max, 1, D)
    params["temporal_pos_embed"] = sd["temporal_pos_embed"][:, :, None]
    params["final"] = _dit_final(sd, perm)
    for i in sd.indices("blocks"):
        params[f"block_{i}"] = _dit_block_joint(sd, f"blocks.{i}")
    return params


def _import_dit4d_tube(sd) -> dict:
    """V2 full tube: their FinalLayer emits only the F future frames per
    token while ours emits all T and slices — the past-frame rows of our
    projection are zero (tests/test_dit4d_tube_torch_parity.py)."""
    pe_w = sd["patch_embed.proj.weight"]  # Conv3d (D, C, T, p, p)
    hidden, c, t_total, p_sz, _ = pe_w.shape
    kernel = np.ascontiguousarray(pe_w.transpose(2, 3, 4, 1, 0))
    fin_w = sd["final_layer.linear.weight"].T  # (hidden, F·C·p·p)
    fin_b = sd["final_layer.linear.bias"]
    f_len = fin_b.size // (c * p_sz * p_sz)
    p_len = t_total - f_len
    ours_w = np.zeros((hidden, t_total * p_sz * p_sz * c), np.float32)
    ours_b = np.zeros((t_total * p_sz * p_sz * c,), np.float32)
    theirs_idx = np.arange(f_len * c * p_sz * p_sz).reshape(
        f_len, c, p_sz, p_sz)
    ours_idx = np.arange(t_total * p_sz * p_sz * c).reshape(
        t_total, p_sz, p_sz, c)
    for ff in range(f_len):
        src = theirs_idx[ff].transpose(1, 2, 0).reshape(-1)
        dst = ours_idx[p_len + ff].reshape(-1)
        ours_w[:, dst] = fin_w[:, src]
        ours_b[dst] = fin_b[src]
    params = _dit_common(sd, kernel)
    # Single temporal slot in V2 → our (learned) embed maps to zeros.
    params["temporal_pos_embed"] = np.zeros((1, 1, 1, hidden), np.float32)
    params["final"] = {
        "AdaLNModulation_0": {
            "Dense_0": _dense(sd, "final_layer.adaLN_modulation.1")
        },
        "Dense_0": {"kernel": ours_w, "bias": ours_b},
    }
    for i in sd.indices("blocks"):
        params[f"block_{i}"] = _dit_block_joint(sd, f"blocks.{i}")
    return params


def _tube_perm(pe_w: np.ndarray) -> np.ndarray:
    """Feature permutation for (pt, C, p, p)-major → (pt, p, p, C)-major."""
    _, c, pt, p_sz, _ = pe_w.shape
    return (np.arange(pt * c * p_sz * p_sz).reshape(pt, c, p_sz, p_sz)
            .transpose(0, 2, 3, 1).reshape(-1))


def _import_dit4d_joint(sd) -> dict:
    pe_w = sd["patch_embed.proj.weight"]  # Conv3d (D, C, pt, p, p)
    kernel = np.ascontiguousarray(pe_w.transpose(2, 3, 4, 1, 0))
    params = _dit_common(sd, kernel)
    params["temporal_pos_embed"] = sd["temporal_pos_embed"][:, :, None]
    params["final"] = _dit_final(sd, _tube_perm(pe_w))
    for i in sd.indices("blocks"):
        params[f"block_{i}"] = _dit_block_joint(sd, f"blocks.{i}")
    return params


def _import_dit4d_factorized(sd) -> dict:
    """V4, the reference DDPM-DiT flagship: factorized spatial self-attn +
    temporal cross-attn per block (tests/test_dit_torch_parity.py)."""
    pe_w = sd["patch_embed.proj.weight"]
    kernel = np.ascontiguousarray(pe_w.transpose(2, 3, 4, 1, 0))
    params = _dit_common(sd, kernel)
    params["temporal_pos_embed"] = sd["temporal_pos_embed"][:, :, None]
    params["final"] = _dit_final(sd, _tube_perm(pe_w))
    for i in sd.indices("blocks"):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "AdaLNModulation_0": {
                "Dense_0": _dense(sd, f"{p}.adaLN_modulation.1")
            },
            "spatial_attn": _mha(sd, f"{p}.spatial_attn"),
            "temporal_attn": _mha(sd, f"{p}.temporal_attn"),
            "Mlp_0": {"Dense_0": _dense(sd, f"{p}.mlp.0"),
                      "Dense_1": _dense(sd, f"{p}.mlp.3")},
        }
    return params


# ---------------------------------------------------------------------------
# ConvRNN forecaster (reference models/convRNN/forecaster.py:23-87)

def _cell(sd, p):
    """Either cell class, with or without biases.  Our ConvGRU fuses the
    reference's separate reset/update convs into one gate conv
    (tests/test_convrnn_torch_parity.py::_map_gru); the ConvLSTM's single
    4-gate conv maps directly."""
    if f"{p}.reset_gate.weight" in sd:  # ConvGRU
        gates = {"kernel": np.concatenate([
            _conv2d(sd, f"{p}.reset_gate")["kernel"],
            _conv2d(sd, f"{p}.update_gate")["kernel"],
        ], axis=-1)}
        if f"{p}.reset_gate.bias" in sd:
            gates["bias"] = np.concatenate(
                [sd[f"{p}.reset_gate.bias"], sd[f"{p}.update_gate.bias"]])
        return {"gates": gates, "candidate": _conv2d(sd, f"{p}.conv_cand")}
    return {"gates": _conv2d(sd, f"{p}.conv")}  # ConvLSTM


def _import_convrnn(sd) -> dict:
    enc = "encoder.encoder_cell_list"
    fl = "forecaster_cell_list"
    return {
        "encoder": {
            "conv1": _conv2d(sd, f"{enc}.0"),
            "rnn1": _cell(sd, f"{enc}.1"),
            "down1": _conv2d(sd, f"{enc}.2"),
            "rnn2": _cell(sd, f"{enc}.3"),
            "down2": _conv2d(sd, f"{enc}.4"),
            "rnn3": _cell(sd, f"{enc}.5"),
        },
        "frnn1": _cell(sd, f"{fl}.0"),
        "fup1": _convT2d(sd, f"{fl}.1"),
        "frnn2": _cell(sd, f"{fl}.2"),
        "fup2": _convT2d(sd, f"{fl}.3"),
        "frnn3": _cell(sd, f"{fl}.4"),
        "fconv4": _conv2d(sd, f"{fl}.5"),
        "head": _conv2d(sd, f"{fl}.6"),
    }
