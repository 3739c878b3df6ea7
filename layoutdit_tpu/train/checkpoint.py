"""Full-state checkpointing over fsspec (local or gs://).

The reference saves only bare ``state_dict`` weights and cannot truly
resume (no optimizer/epoch state — model.py:90-121, SURVEY.md §5). Here a
checkpoint is one msgpack blob holding params, optimizer state, epoch and
arbitrary extras, serialized with flax.serialization so any pytree
round-trips; restore validates against a template pytree.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from layoutdit_tpu.log import get_logger
from layoutdit_tpu.parallel.mesh import is_lead_host

logger = get_logger(__name__)

_MAGIC = b"LDTPU1\n"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _build_payload(params, opt_state, epoch, extra, snapshot=_to_host):
    return {
        "params": snapshot(params),
        "opt_state": snapshot(opt_state) if opt_state is not None else {},
        "meta": {
            "epoch": epoch,
            "extra": json.dumps(extra or {}),
            "has_opt_state": opt_state is not None,
        },
    }


def _write_payload(path: str, payload: dict) -> None:
    """Write-then-rename so a crash mid-write never leaves a truncated
    file under the final name: ``--resume auto`` picks the NEWEST
    checkpoint, so a partial write at the newest path would otherwise be
    selected on every restart and brick the restart loop. POSIX rename is
    atomic; object stores (gs://) make uploads all-or-nothing anyway, and
    there mv degrades to copy+delete of an already-complete object. The
    ``.tmp`` suffix never matches the checkpoint filename pattern
    (_list_checkpoints), so an orphaned temp file is inert."""
    import fsspec

    blob = serialization.to_bytes(payload)
    fs, p = fsspec.core.url_to_fs(path)
    parent = p.rsplit("/", 1)[0] if "/" in p else ""
    if parent:
        fs.makedirs(parent, exist_ok=True)
    tmp = p + ".tmp"
    with fs.open(tmp, "wb") as f:
        f.write(_MAGIC + blob)
    fs.mv(tmp, p)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    extra: Optional[dict] = None,
) -> None:
    """Full-state msgpack checkpoint. Multi-host: state on this path is
    replicated (non-trivially sharded state goes through the orbax path,
    models/model.py), so process 0 writes and everyone barriers — two
    hosts writing one object-store path would race."""
    if is_lead_host():
        _write_payload(path, _build_payload(params, opt_state, epoch, extra))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("layoutdit_ckpt_full")


class AsyncCheckpointWriter:
    """Background checkpoint writes so training never blocks on storage
    (SURVEY.md §7 build plan: "full state … async to GCS").

    The device→host snapshot runs on the caller's thread — it must finish
    before the train loop donates the parameter buffers to the next step —
    with an explicit host COPY (on the CPU backend ``np.asarray`` can
    alias the device buffer, which a later donation would corrupt).
    Serialization and the fsspec write run on one worker thread; at most
    one write is in flight (a second save waits for the first). Worker
    errors surface on the next save()/wait() rather than being lost.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending = None

    def save(
        self,
        path: str,
        params: Any,
        opt_state: Any = None,
        epoch: int = 0,
        extra: Optional[dict] = None,
    ) -> None:
        if not is_lead_host():
            # replicated state: the lead host's writer persists it (same
            # ownership rule as the synchronous path); no barrier here —
            # durability is settled at close()
            return
        self.wait()  # ≤1 in flight; re-raise a failed previous write
        payload = _build_payload(
            params, opt_state, epoch, extra,
            snapshot=lambda t: jax.tree_util.tree_map(np.array, t),
        )
        self._pending = self._executor.submit(_write_payload, path, payload)

    def wait(self) -> None:
        """Block until the in-flight write (if any) lands; re-raise its
        error here, on the training thread."""
        if self._pending is not None:
            fut, self._pending = self._pending, None
            fut.result()

    def close(self) -> None:
        try:
            self.wait()
        finally:
            self._executor.shutdown(wait=True)


def load_checkpoint(
    path: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> dict:
    """Returns {"params", "opt_state" (None unless template given),
    "epoch", "extra"}."""
    import fsspec

    with fsspec.open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path} is not a layoutdit_tpu checkpoint")
    # restore subtree-by-subtree so a params-only checkpoint (e.g. a
    # converted reference model, has_opt_state=False) loads under an
    # opt_state template instead of raising on the empty stored subtree
    raw = serialization.msgpack_restore(data[len(_MAGIC):])
    meta = raw.get("meta", {})
    has_opt = bool(meta.get("has_opt_state", False))
    params = serialization.from_state_dict(params_template, raw["params"])
    opt_state = None
    if opt_state_template is not None and has_opt:
        opt_state = serialization.from_state_dict(
            opt_state_template, raw["opt_state"]
        )
    return {
        "params": params,
        "opt_state": opt_state,
        "epoch": int(meta.get("epoch", 0)),
        "extra": json.loads(meta.get("extra", "{}")),
    }


# ------------------------------------------------------- sharded (orbax)
# For tensor-parallel / multi-host state the msgpack path above would
# gather every shard to one host (memory spike at DiT-large scale, and
# wrong across processes). The orbax path writes each shard from the
# process that owns it and restores directly INTO the target shardings —
# no full-array host copy at any point.


def _is_nontrivially_sharded(tree) -> bool:
    """True when any leaf is a jax.Array with a non-replicated sharding."""

    def check(x):
        sh = getattr(x, "sharding", None)
        return sh is not None and not sh.is_fully_replicated

    return any(check(x) for x in jax.tree_util.tree_leaves(tree))


def save_checkpoint_sharded(
    path: str,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    extra: Optional[dict] = None,
) -> None:
    """Write a per-shard (orbax/tensorstore) checkpoint directory.

    Each process writes only its addressable shards; metadata rides in a
    sibling JSON. ``path`` is a directory (local or gs://).
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path) if "://" not in path else path
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    import fsspec

    meta = {"epoch": epoch, "extra": extra or {}, "has_opt_state": opt_state is not None}
    if is_lead_host():
        with fsspec.open(path.rstrip("/") + ".meta.json", "w") as f:
            f.write(json.dumps(meta))
    if jax.process_count() > 1:
        # Without a barrier, processes != 0 can return (and restore) before
        # process 0 has written the sibling meta file.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("layoutdit_ckpt_meta")


def load_checkpoint_sharded(
    path: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> dict:
    """Restore a sharded checkpoint directly into the templates' shardings.

    Template leaves may be jax.Arrays (their shardings are reused) or
    jax.ShapeDtypeStruct with a sharding. Returns the same dict shape as
    ``load_checkpoint``.
    """
    import os

    import fsspec
    import orbax.checkpoint as ocp

    path = os.path.abspath(path) if "://" not in path else path

    def as_abstract(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    try:
        with fsspec.open(path.rstrip("/") + ".meta.json", "r") as f:
            meta = json.loads(f.read())
    except FileNotFoundError:
        meta = {"epoch": 0, "extra": {}}

    target = {"params": jax.tree_util.tree_map(as_abstract, params_template)}
    if opt_state_template is not None:
        target["opt_state"] = jax.tree_util.tree_map(
            as_abstract, opt_state_template
        )
    with ocp.StandardCheckpointer() as ckptr:
        if opt_state_template is None and meta.get("has_opt_state"):
            # Checkpoints written from training carry an 'opt_state'
            # subtree; orbax raises on a tree-structure mismatch, so a
            # params-only restore must still name it in the target. Build
            # abstract structs from the stored metadata (host-replicated —
            # the subtree is dropped immediately after restore).
            md = ckptr.metadata(path)
            opt_md = md["opt_state"] if isinstance(md, dict) else md.opt_state
            target["opt_state"] = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), opt_md
            )
            state = ckptr.restore(path, target)
            state.pop("opt_state", None)
        else:
            state = ckptr.restore(path, target)
    return {
        "params": state["params"],
        "opt_state": state.get("opt_state"),
        "epoch": int(meta["epoch"]),
        "extra": meta["extra"],
    }


def _list_checkpoints(root: str):
    """(fs, [(epoch, tag, path), ...]) for every epoch-named checkpoint
    under ``root`` — the ONE place that parses checkpoint filenames
    (``epoch_<n>[_tag].{msgpack,orbax}``; rolling ``best.*`` never
    matches). Returns (fs, []) when the directory is absent."""
    import re

    import fsspec

    fs, rootp = fsspec.core.url_to_fs(root)
    try:
        names = fs.ls(rootp, detail=False)
    except FileNotFoundError:
        return fs, []
    pat = re.compile(r"epoch_(\d+)(?:_([a-z]+))?\.(msgpack|orbax)$")
    return fs, [
        (int(m.group(1)), m.group(2) or "", n)
        for n in names
        for m in [pat.search(n)]
        if m
    ]


def prune_checkpoints(root: str, keep: int, current_epoch: int) -> list[str]:
    """Retention policy: keep the newest ``keep`` periodic checkpoints
    (``epoch_<n>.msgpack`` / ``epoch_<n>.orbax``) under ``root``, delete
    the rest. Tagged saves (``*_preempt``) and rolling ``best.*`` are
    never touched. ``current_epoch`` counts as existing even if its
    (async) write is still in flight; a slower in-flight write of an
    older epoch can resurface a pruned file until the next cadence prunes
    it again. Returns the deleted paths. Multi-host: only the lead host
    prunes (matching the lead-host-only msgpack writes; two hosts racing
    fs.rm on one object-store path would crash the loser).

    The reference keeps every checkpoint forever (model.py:90-121) —
    at PubLayNet scale that is ~1 GB per save.
    """
    if keep <= 0 or not is_lead_host():
        return []
    fs, entries = _list_checkpoints(root)
    found = [(e, n) for e, tag, n in entries if not tag]
    keep_set = set(sorted(
        {e for e, _ in found} | {current_epoch}, reverse=True
    )[:keep])
    deleted = []
    for e, n in found:
        if e in keep_set:
            continue
        fs.rm(n, recursive=True)  # .orbax checkpoints are directories
        meta = n + ".meta.json"   # orbax sidecar
        if fs.exists(meta):
            fs.rm(meta)
        deleted.append(n)
        logger.info("Pruned checkpoint %s (keep_checkpoints=%d)", n, keep)
    return deleted


def list_resume_candidates(root: str) -> list[tuple[int, int, str]]:
    """Resumable checkpoints under ``root`` (a model_checkpoints
    directory), best first: periodic ``epoch_<n>.{msgpack,orbax}`` and
    preemption ``epoch_<n>_preempt.*`` saves, ordered by (epoch,
    preempt-after-periodic) descending — a preempt save at epoch N
    carries extra mid-epoch steps, so it outranks the periodic save of
    the same epoch. Rolling ``best.*`` saves are skipped (they track
    eval quality, not training progress). Each entry is
    ``(epoch, is_preempt, path)`` — callers that need the rank (the
    trainer's multi-host agreement check) take it from here instead of
    re-parsing filenames. Empty when the directory is absent or empty,
    so preemption restart loops can pass ``--resume auto``
    unconditionally — first run starts fresh, every restart resumes,
    and a candidate that fails to load (e.g. truncated by a mid-write
    kill) falls back to the next-newest instead of bricking the loop.
    """
    fs, entries = _list_checkpoints(root)
    found = sorted(
        (
            (e, 1 if tag == "preempt" else 0, n)
            for e, tag, n in entries
            if tag in ("", "preempt")
        ),
        reverse=True,
    )
    if fs.protocol in ("file", ("file", "local"), "local"):
        return found  # keep plain POSIX paths plain
    return [(e, r, fs.unstrip_protocol(n)) for e, r, n in found]


def find_latest_checkpoint(root: str) -> Optional[str]:
    """Path of the best resume candidate (see list_resume_candidates),
    or None when there is none."""
    found = list_resume_candidates(root)
    return found[0][2] if found else None
