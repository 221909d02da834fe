"""Checkpointing with explicit metadata.

The reference pickles ``{"opt", "model"}`` state dicts and encodes run
metadata in the *filename*, regex-parsing it back at metric time
(/root/reference/utils/utils.py:120-167, models/diffusion/ddpm.py:343) — a
scheme whose ``NA`` tag doesn't even match its own parser
(SURVEY.md §7 bug list).  Here checkpoints are orbax directories holding the
train-state pytree plus a ``metadata.json`` sidecar with the same fields as
first-class keys; the reference's filename convention is still *produced*
(``checkpoint_name``) so humans and comparison tooling can map runs 1:1.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np

from crowdmod_tpu.config import FrozenConfig


def checkpoint_name(cfg: FrozenConfig, arch: str, epoch: int | str) -> str:
    """Reference-style run name (utils.py:120-147 semantics).

    Tag field: 'NA' for DDPM, the FM W_TYPE, or the ConvRNN cell base name.
    """
    if arch in ("DDPM-UNet", "DDPM-DiT", "FM-UNet", "FM-DiT"):
        family, backbone = arch.upper().split("-")
        node = getattr(getattr(cfg.MODEL, family), backbone)
        total_epochs = node.TRAIN.EPOCHS
        tag = "NA" if family == "DDPM" else cfg.MODEL.FM.W_TYPE
    elif arch == "ConvRNN":
        total_epochs = cfg.MODEL.CONVRNN.TRAIN.EPOCHS
        tag = cfg.MODEL.CONVRNN.CELL_CLASS[4:]  # strip 'Conv'
    else:
        raise ValueError(f"unknown arch {arch!r}")
    return (
        f"{arch}_{cfg.DATASET.NAME}_TE{total_epochs}"
        f"_PL{cfg.DATASET.PAST_LEN}_FL{cfg.DATASET.FUTURE_LEN}"
        f"_CE{epoch}_{tag}"
    )


def run_tag(cfg: FrozenConfig, arch: str, epoch: int | str) -> str:
    """The metadata substring used in metric CSV filenames
    (reference regex 'TE\\d+_PL\\d+_FL\\d+_CE\\d+_...', ddpm.py:343)."""
    name = checkpoint_name(cfg, arch, epoch)
    return name.split(f"{cfg.DATASET.NAME}_", 1)[1]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# One process-wide async checkpointer so in-flight saves are tracked and
# waited on; created lazily (orbax spins up a thread pool).
_ASYNC: Any = None
# (staging dir, final dir, sidecar path | None) triples: the async save
# commits into the staging dir; wait_for_saves swaps it into place and folds
# the metadata sidecar in.
_PENDING: list = []

_STAGE_SUFFIX = ".pending"


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves() -> None:
    """Block until every async checkpoint save has committed, then swap each
    staged directory into its final place and fold in sidecar metadata.

    The swap-after-commit ordering means the PREVIOUS checkpoint at the
    final path stays intact until its replacement is fully on disk — a hard
    kill mid-commit can never leave the run with no checkpoint at all.
    """
    import shutil

    if _ASYNC is not None:
        _ASYNC.wait_until_finished()
    while _PENDING:
        staged, final, sidecar = _PENDING.pop()
        if staged.is_dir():
            if sidecar is not None and sidecar.exists():
                sidecar.replace(staged / "metadata.json")
            if final.exists():
                shutil.rmtree(final)
            staged.replace(final)


def save_checkpoint(
    directory: str | os.PathLike,
    state: Any,
    metadata: dict | None = None,
    *,
    async_save: bool = False,
) -> str:
    """Save a train-state pytree + metadata.json under ``directory``.

    ``async_save=True`` copies the state to host and returns immediately
    while orbax commits in a background thread — the train loop keeps the
    TPU busy during I/O.  Call :func:`wait_for_saves` (or save once more
    synchronously) before reading the checkpoint back.

    Multi-process (pod) semantics: every process calls this with the same
    arguments; FSDP/TP-sharded leaves are all-gathered to full host arrays,
    process 0 alone commits the files (single-writer), and everyone leaves
    through a barrier so no host can read a half-committed checkpoint.
    Async staging is a single-process optimization — on pods the commit is
    synchronous.
    """
    directory = Path(directory).absolute()
    multiprocess = jax.process_count() > 1
    if multiprocess:
        # All-gather BEFORE the is_main gate: every process participates in
        # the collective, then only process 0 touches the filesystem.
        from crowdmod_tpu.parallel.multiprocess import (
            barrier, is_main, process_allgather,
        )

        host_state = process_allgather(state)
        import shutil

        if is_main() and directory.exists():
            shutil.rmtree(directory)
        barrier("ckpt-clear")
        # EVERY process enters orbax's save — the checkpointer coordinates
        # internally (its own cross-host barriers; host-replicated numpy
        # leaves are written by the primary host only).  Gating it to
        # process 0 would deadlock the orbax sync.
        _checkpointer().save(directory, host_state)
        if is_main() and metadata is not None:
            _atomic_json(directory / "metadata.json", metadata)
        barrier("ckpt-save")
        return str(directory)
    # orbax creates the tree itself, but on the async path the metadata
    # sidecar below is written from THIS thread, possibly before the
    # background commit has made the parent — create it deterministically.
    directory.parent.mkdir(parents=True, exist_ok=True)
    # Any pending async saves must commit first — both so this save can't
    # race a prior one to the same directory, and so the documented
    # "save once more synchronously" flush contract actually holds.
    wait_for_saves()
    import shutil

    host_state = jax.device_get(state)
    if async_save:
        # Stage into a sibling dir and swap in wait_for_saves AFTER the
        # background commit: the current checkpoint at `directory` survives
        # until its replacement is complete (no window with no checkpoint).
        staged = Path(f"{directory}{_STAGE_SUFFIX}")
        if staged.exists():
            shutil.rmtree(staged)
        _async_checkpointer().save(staged, host_state)
        sidecar = None
        if metadata is not None:
            # The sidecar is written from THIS thread; it must not race the
            # background commit's directory rename, so it lives next to the
            # staging dir until the swap.
            sidecar = Path(f"{directory}.meta.json")
            _atomic_json(sidecar, metadata)
        _PENDING.append((staged, Path(directory), sidecar))
    else:
        if directory.exists():
            # orbax refuses to overwrite; mirror torch.save's replace
            # semantics.
            shutil.rmtree(directory)
        _checkpointer().save(directory, host_state)
        if metadata is not None:
            _atomic_json(directory / "metadata.json", metadata)
    return str(directory)


def _atomic_json(path: Path, payload: dict) -> None:
    """Write JSON via temp+rename so a mid-write kill can't leave a
    truncated file that breaks every later resume."""
    tmp = Path(f"{path}.tmp{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    tmp.replace(path)


def load_checkpoint(directory: str | os.PathLike, template: Any | None = None):
    """Restore ``(state, metadata)``; ``template`` restores exact pytree/dtype
    structure (pass the freshly initialized state)."""
    directory = Path(directory).absolute()
    if template is not None:
        import orbax.checkpoint as ocp

        if jax.process_count() > 1:
            # Cross-host-sharded template leaves can't be device_get locally;
            # gather them (every process restores the full host copy and
            # re-shards at device_put time).
            from crowdmod_tpu.parallel.multiprocess import process_allgather

            host_template = process_allgather(template)
        else:
            host_template = jax.device_get(template)
        restored = _checkpointer().restore(
            directory, item=jax.tree.map(np.asarray, host_template)
        )
        # Preserve the template's tree classes (orbax may return dicts).
        flat = jax.tree.leaves(restored)
        restored = jax.tree.unflatten(jax.tree.structure(template), flat)
    else:
        restored = _checkpointer().restore(directory)
    return restored, read_metadata(directory)


def read_metadata(directory: str | os.PathLike) -> dict | None:
    """Read a checkpoint's metadata.json (or its async-save sidecar) without
    restoring the state pytree.

    Tolerates a truncated/corrupt file (→ None): metadata is advisory and a
    half-written file from a hard kill must not break every later resume.
    The sidecar fallback is only honored while the checkpoint directory
    itself exists — an orphaned sidecar describes a checkpoint that was
    never committed.
    """
    directory = Path(directory).absolute()
    meta_path = directory / "metadata.json"
    if not meta_path.exists():
        if not directory.is_dir():
            return None
        meta_path = Path(f"{directory}.meta.json")  # async-save sidecar
    if not meta_path.exists():
        return None
    try:
        return json.loads(meta_path.read_text())
    except (json.JSONDecodeError, OSError):
        return None


def gc_checkpoints(
    save_dir: str | os.PathLike,
    cfg: FrozenConfig,
    arch: str,
    *,
    keep_epochs: int | None = None,
    remove_abort: bool = False,
) -> list[str]:
    """Garbage-collect this run's stale checkpoints under ``save_dir``.

    Retention policy (the reference has none — old ``.pth`` files simply
    accumulate):

      * the best-loss checkpoint (tag ``000``) is always kept;
      * of the numbered epoch checkpoints, only the ``keep_epochs`` highest
        epochs survive (``0`` deletes all, ``None`` keeps all);
      * the emergency ``abort`` checkpoint is dropped when ``remove_abort``
        (i.e. after a run completes, its crash-recovery point is obsolete);
      * half-committed ``*.orbax-checkpoint-tmp`` directories and orphaned
        ``*.meta.json`` sidecars from crashed async saves are always removed.

    Only checkpoints matching this (cfg, arch) run's naming scheme are
    touched; other runs sharing the directory are invisible to the sweep.
    Returns the removed paths.  Multi-process: single-writer — only
    process 0 sweeps (concurrent rmtree on a shared filesystem races).
    """
    import shutil

    if jax.process_count() > 1 and jax.process_index() != 0:
        return []
    save = Path(save_dir)
    if not save.is_dir():
        return []
    template = checkpoint_name(cfg, arch, "@EPOCH@")
    pre, post = template.split("@EPOCH@")
    removed: list[str] = []

    def _rm(path: Path):
        if path.is_dir():
            shutil.rmtree(path)
        else:
            path.unlink()
        sidecar = Path(f"{path}.meta.json")
        if sidecar.exists():
            sidecar.unlink()
        removed.append(str(path))

    numbered: list[tuple[int, Path]] = []
    for entry in sorted(save.iterdir()):
        name = entry.name
        if name.endswith(".orbax-checkpoint-tmp"):
            stem = name[: -len(".orbax-checkpoint-tmp")]
            # Also covers staging dirs' own orbax tmps (X.pending.orbax-…).
            if stem.endswith(_STAGE_SUFFIX):
                stem = stem[: -len(_STAGE_SUFFIX)]
            if stem.startswith(pre) and stem.endswith(post):
                _rm(entry)
            continue
        if name.endswith(_STAGE_SUFFIX):
            # Orphaned staging dir from an async save that never swapped
            # (crashed mid-commit).
            stem = name[: -len(_STAGE_SUFFIX)]
            if stem.startswith(pre) and stem.endswith(post):
                _rm(entry)
            continue
        if name.endswith(".meta.json"):
            stem = name[: -len(".meta.json")]
            if (stem.startswith(pre) and stem.endswith(post)
                    and not (save / stem).exists()):
                entry.unlink()
                removed.append(str(entry))
            continue
        if not (name.startswith(pre) and name.endswith(post) and entry.is_dir()):
            continue
        tag = name[len(pre):len(name) - len(post)] if post else name[len(pre):]
        if tag == "000":
            continue
        if tag == "abort":
            if remove_abort:
                _rm(entry)
            continue
        if tag.isdigit():
            numbered.append((int(tag), entry))

    if keep_epochs is not None:
        numbered.sort()
        drop = numbered if keep_epochs == 0 else numbered[:-keep_epochs]
        for _, entry in drop:
            _rm(entry)
    return removed


def build_metadata(cfg: FrozenConfig, arch: str, epoch: int | str,
                   extra: dict | None = None) -> dict:
    meta = {
        "arch": arch,
        "dataset": cfg.DATASET.NAME,
        "total_epochs": None,
        "past_len": cfg.DATASET.PAST_LEN,
        "future_len": cfg.DATASET.FUTURE_LEN,
        "epoch": epoch,
        "name": checkpoint_name(cfg, arch, epoch),
    }
    if arch == "ConvRNN":
        meta["total_epochs"] = cfg.MODEL.CONVRNN.TRAIN.EPOCHS
        meta["cell"] = cfg.MODEL.CONVRNN.CELL_CLASS
    else:
        family, backbone = arch.upper().split("-")
        meta["total_epochs"] = getattr(
            getattr(cfg.MODEL, family), backbone
        ).TRAIN.EPOCHS
        if family == "FM":
            meta["w_type"] = cfg.MODEL.FM.W_TYPE
    if extra:
        meta.update(extra)
    return meta
