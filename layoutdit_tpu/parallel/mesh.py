"""Device mesh + sharding utilities (the reference's distributed-training
TODO, README.md:59, realised TPU-natively).

Data parallelism is expressed declaratively: build a Mesh over the chips,
shard the batch dimension over the ``data`` axis, replicate parameters,
and let jit insert the gradient all-reduce over ICI (SPMD — no NCCL-style
explicit collectives). The same code path runs single-chip (trivial mesh),
on a real multi-chip slice, or on a virtual
``--xla_force_host_platform_device_count`` CPU mesh in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdit_tpu.config.constructs import MeshConfig
from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def maybe_distributed_init(cfg: MeshConfig) -> None:
    """Multi-host bring-up (replaces torch.distributed/NCCL init — none in
    the reference, SURVEY.md §2.3).

    Must run BEFORE any backend-touching jax call: probing
    ``jax.process_count()`` (as round 1 did) initializes the local-only
    backend, after which ``jax.distributed.initialize()`` raises and
    multi-host silently degrades to N independent single-host runs. The
    decision therefore comes from config/environment only:

      * explicit ``coordinator_address``/``num_processes``/``process_id``
        on MeshConfig (or the standard JAX env vars they default from),
      * else no-arg ``initialize()``, which autodetects TPU pod / GKE /
        SLURM environments and raises cleanly elsewhere.
    """
    if not cfg.enable_distributed_init:
        return
    if jax.distributed.is_initialized():
        logger.info("jax.distributed already initialized")
        return
    kwargs = {}
    if cfg.coordinator_address:
        kwargs = dict(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )
    # coordination-service timeouts (constructs.py): a peer stalled in a
    # long compile on an oversubscribed host must not trip the other
    # process's shutdown barrier / heartbeat and kill a healthy run.
    # Signature-checked: on a jax too old to accept them, a TypeError
    # here would be swallowed by the except below and silently turn
    # multi-host OFF (every process as its own lead host) — drop the
    # knob with a loud warning instead.
    import inspect

    try:
        accepted = inspect.signature(jax.distributed.initialize).parameters
    except (TypeError, ValueError):
        accepted = {}
    for name, val in (
        ("heartbeat_timeout_seconds", cfg.heartbeat_timeout_s),
        ("shutdown_timeout_seconds", cfg.shutdown_timeout_s),
    ):
        if val is None:
            continue
        if name in accepted:
            kwargs[name] = int(val)
        else:
            logger.warning(
                "this jax's distributed.initialize lacks %s; ignoring the "
                "configured timeout", name,
            )
    try:
        jax.distributed.initialize(**kwargs)
        logger.info(
            "jax.distributed up: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
    except Exception as e:
        # single-host run with the flag on: degrade loudly, not silently
        logger.warning("jax.distributed.initialize failed: %s", e)


def is_lead_host() -> bool:
    """Process 0 owns every shared-path artifact (msgpack checkpoints,
    metrics, TensorBoard events, pruning): two hosts writing one
    object-store path race, and fs.rm from both crashes the loser. The
    ONE place the ownership rule lives — checkpointing, the trainer and
    the evaluator all route through it."""
    return jax.process_index() == 0


def model_axis_name(mesh: Mesh) -> str | None:
    """The tensor-parallel axis of ``mesh``: the axis NAMED 'model', or
    None. Strictly by name — every sharding consumer (param specs, the
    serving engine, sequence parallelism) resolves it through here, so a
    name/position disagreement can no longer make the engine claim TP
    while the specs replicate (Mesh(devs, ('model',))) or Megatron-shard
    the wrong axis (Mesh(devs, ('model', 'data'))). Axes with other
    names ('tp', 'pipe') deliberately do NOT trigger TP: a mesh without
    a 'model' axis is pure data/pipeline parallelism."""
    return "model" if "model" in mesh.axis_names else None


def data_axis_name(mesh: Mesh) -> str | None:
    """The batch-sharding axis: 'data' when present, else the first axis
    that is not the model axis."""
    model = model_axis_name(mesh)
    if "data" in mesh.axis_names and "data" != model:
        return "data"
    return next((n for n in mesh.axis_names if n != model), None)


def build_mesh(
    cfg: MeshConfig, devices: list | None = None, strict: bool = False,
    granule_fn=None,
) -> Mesh:
    """Mesh over all devices: ('data', 'model') axes (+ a trailing 'pipe'
    axis when pipeline_parallel > 1); data axis takes the remainder when
    data_parallel == -1. ``strict=True`` raises instead of silently
    falling back to Nx1 when the requested topology does not factor the
    device count — callers that promised the user a specific tp/pp degree
    (the serve CLI) must not quietly deliver a different one.

    When ``cfg.dcn_data_parallel > 1`` the mesh is HYBRID: devices are
    grouped into DCN granules (TPU slices, else host processes — or an
    explicit ``granule_fn(device) -> key`` in tests) and the granule dim
    is laid outermost on the data axis, so model/pipe collectives and the
    inner data shards ride ICI while only the gradient all-reduce's final
    hierarchical stage crosses DCN (SURVEY.md §2.3 layout rule)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    pp = max(1, getattr(cfg, "pipeline_parallel", 1))
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // (mp * pp)
    if dp * mp * pp != n:
        if strict:
            raise ValueError(
                f"mesh {dp}x{mp}x{pp} (data x model x pipe) needs "
                f"{dp * mp * pp} devices, got {n}"
            )
        logger.warning(
            "mesh %dx%dx%d != %d devices; falling back to %dx1 "
            "(flat, dcn_data_parallel reset to 1)",
            dp, mp, pp, n, n,
        )
        # the fallback is a degenerate flat mesh: keeping the user's dcn
        # would validate it against a dp THEY never set (confusing error
        # from a path documented to warn-and-fallback, not raise)
        dp, mp, pp = n, 1, 1
        dcn = 1
    else:
        dcn = max(1, getattr(cfg, "dcn_data_parallel", 1))
    if dcn > 1:
        arr = _hybrid_device_array(devices, dp, mp, pp, dcn, granule_fn)
    elif pp > 1:
        arr = np.asarray(devices).reshape(dp, mp, pp)
    else:
        arr = np.asarray(devices).reshape(dp, mp)
    if pp > 1:
        return Mesh(arr, axis_names=(*cfg.axis_names, "pipe"))
    return Mesh(arr, axis_names=cfg.axis_names)


def _granule_key_fn(devices, granule_fn):
    """How devices group into DCN granules: an injected test hook, else
    TPU slice_index when it actually distinguishes slices, else the
    owning host process. (CPU devices also expose slice_index, but it is
    0 everywhere — a constant key is no grouping, so fall through.)"""
    if granule_fn is not None:
        return granule_fn
    slices = {getattr(d, "slice_index", None) for d in devices}
    if None not in slices and len(slices) > 1:
        return lambda d: d.slice_index
    return lambda d: d.process_index


def _granules(devices, granule_fn, dcn, min_size):
    """Group ``devices`` into exactly ``dcn`` granules of >= ``min_size``
    devices each, ordered by granule key. The ONE place granule-count and
    granule-size validation lives — every hybrid-mesh path goes through
    it, so no path can silently idle a whole slice."""
    key = _granule_key_fn(devices, granule_fn)
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    if len(groups) != dcn:
        raise ValueError(
            f"dcn_data_parallel={dcn} but devices form {len(groups)} "
            f"granules ({sorted(groups)}) — one granule per slice/host"
        )
    sizes = {k: len(v) for k, v in groups.items()}
    if any(s < min_size for s in sizes.values()):
        raise ValueError(
            f"hybrid mesh needs >= {min_size} devices per granule, "
            f"got {sizes}"
        )
    return [groups[k] for k in sorted(groups)]


def _hybrid_device_array(devices, dp, mp, pp, dcn, granule_fn):
    """[dp, mp(, pp)] device array for a hybrid ICI x DCN mesh: data index
    d = granule * dp_ici + inner, so a granule's devices are contiguous on
    the data axis and every model/pipe neighbour shares its granule."""
    if dp % dcn != 0:
        raise ValueError(
            f"dcn_data_parallel={dcn} must divide data_parallel={dp}"
        )
    per = dp // dcn * mp * pp
    groups = _granules(devices, granule_fn, dcn, per)
    if any(len(g) != per for g in groups):
        raise ValueError(
            f"hybrid mesh needs exactly {per} devices per granule "
            f"(dp_ici={dp // dcn} x mp={mp} x pp={pp}), "
            f"got {[len(g) for g in groups]}"
        )
    shape = (dp // dcn, mp, pp) if pp > 1 else (dp // dcn, mp)
    blocks = [_ici_device_array(g, shape) for g in groups]
    return np.concatenate(blocks, axis=0)


def _ici_device_array(group, shape):
    """In-granule device layout: ICI-topology-aware order on real TPU
    slices (mesh_utils wraps the torus so mesh neighbours are wire
    neighbours), plain enumeration order elsewhere (CPU/1-chip)."""
    group = list(group)
    if len(group) > 1 and all(d.platform == "tpu" for d in group):
        try:
            from jax.experimental import mesh_utils

            return mesh_utils.create_device_mesh(shape, devices=group)
        except Exception as e:  # odd topology: fall back, stay correct
            logger.warning("ICI-aware in-granule layout failed: %s", e)
    return np.asarray(group).reshape(shape)


def build_mesh_for_batch(
    cfg: MeshConfig, batch_size: int, granule_fn=None
) -> Mesh:
    """Mesh whose data axis divides ``batch_size`` (a global batch must
    shard evenly); uses the largest usable device prefix (per granule on
    hybrid meshes)."""
    devices = jax.devices()
    mp = max(1, cfg.model_parallel)
    pp = max(1, getattr(cfg, "pipeline_parallel", 1))
    dcn = max(1, getattr(cfg, "dcn_data_parallel", 1))
    dp_max = (
        cfg.data_parallel if cfg.data_parallel > 0
        else len(devices) // (mp * pp)
    )
    # hybrid meshes can only clamp dp in whole granules (every granule
    # must keep the same dp_ici x mp x pp shape), so step by dcn
    candidates = [
        d for d in range(dcn, dp_max + 1, dcn) if batch_size % d == 0
    ]
    if not candidates:
        raise ValueError(
            f"batch_size={batch_size} has no data-parallel degree that is "
            f"a multiple of dcn_data_parallel={dcn} (<= {dp_max})"
        )
    dp = max(candidates)
    if dp != dp_max:
        logger.warning(
            "data_parallel clamped %d -> %d to divide batch_size=%d",
            dp_max, dp, batch_size,
        )
    # hybrid: take each granule's device prefix, not the global prefix
    # (the global prefix would put both data shards of a 2-granule mesh
    # on granule 0 and idle granule 1 entirely). _granules validates
    # granule count and minimum size — a topology whose granules don't
    # match dcn must raise here exactly like it does in build_mesh, not
    # quietly train on a subset of slices.
    if dcn > 1 and dp * mp * pp != len(devices):
        per = dp // dcn * mp * pp
        groups = _granules(devices, granule_fn, dcn, per)
        devices = [d for g in groups for d in g[:per]]
    return build_mesh(
        MeshConfig(
            data_parallel=dp, model_parallel=mp, pipeline_parallel=pp,
            pipeline_microbatches=getattr(cfg, "pipeline_microbatches", 4),
            axis_names=cfg.axis_names, dcn_data_parallel=dcn,
        ),
        devices=devices[: dp * mp * pp],
        granule_fn=granule_fn,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sequence_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding | None:
    """Sharding for the encoder's [B, N, D] residual stream when sequence
    parallelism is on: tokens over the model axis. None when SP is off or
    there is no model axis to shard over (so callers can pass it straight
    to detector_loss/vit_forward's seq_sharding)."""
    model_axis = model_axis_name(mesh)
    if (
        not getattr(cfg, "sequence_parallel", False)
        or model_axis is None
        or mesh.shape[model_axis] <= 1
    ):
        return None
    return NamedSharding(mesh, P(None, model_axis, None))


def pipeline_config(mesh: Mesh, cfg: MeshConfig):
    """PipelineConfig for the encoder when the mesh has a non-trivial
    'pipe' axis, else None (callers pass it straight to detector_loss /
    detector_predict / vit_forward's ``pipeline``)."""
    if "pipe" not in mesh.axis_names or mesh.shape["pipe"] <= 1:
        return None
    from layoutdit_tpu.parallel.pipeline import PipelineConfig

    return PipelineConfig(
        mesh=mesh,
        n_microbatches=max(1, getattr(cfg, "pipeline_microbatches", 4)),
        data_axis=mesh.axis_names[0],
    )


def shard_batch_tree(tree, mesh: Mesh):
    """device_put every leaf with its batch dim sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
