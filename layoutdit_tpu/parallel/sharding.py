"""Parameter sharding rules: data + tensor parallelism over the mesh.

The reference has no distributed training at all (SURVEY.md §2.3). Here
parallelism is declarative SPMD: parameters carry NamedShardings and XLA's
partitioner inserts the collectives (all-gather/reduce-scatter over ICI).

Tensor-parallel layout (Megatron-style, for DiT-large and beyond):
  * attention q/k/v projections: output dim (heads) sharded over 'model',
  * attention output projection: input dim sharded (row-parallel) — XLA
    emits one all-reduce per block,
  * MLP in: column-parallel; MLP out: row-parallel — one more all-reduce,
  * everything else (embeddings, LN, FPN, detection heads) replicated —
    they are small next to the encoder.

Data parallel: the batch is sharded over 'data'; gradients all-reduce
implicitly because params are replicated along that axis.

Expert parallel (ViTConfig.num_experts > 0, ops/moe.py): the stacked
expert kernels [E, D, F] shard their E dim over 'model' — each shard owns
E/tp experts, and the one-hot dispatch/combine einsums become the token
exchange (GSPMD inserts the all-to-all-shaped collectives from the
parameter shardings alone).

Sequence parallel (MeshConfig.sequence_parallel): the encoder's [B, N, D]
residual stream is constrained to P(None, 'model', None) at every block
boundary (mesh.sequence_sharding -> vit_forward's seq_sharding). Combined
with the TP layout above, XLA derives the Megatron-SP schedule: LN and
residual adds run on token shards, tokens all-gather into the
column-parallel matmuls, and the row-parallel all-reduces become
reduce-scatters back to token shards — cutting per-chip activation
memory by the TP degree at high-res token counts. Numerics-neutral
(tests/test_parallel.py parity test).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def _vit_layer_specs(model_axis: str) -> dict:
    col = P(None, model_axis)  # output-dim sharded
    row = P(model_axis, None)  # input-dim sharded
    # LoRA factors (models/lora.py) mirror the kernel they adapt: on
    # column-parallel projections A ([D, r]) is replicated and B ([r, D])
    # shards its output dim; on row-parallel ones A shards its input dim
    # and B is replicated — the delta's partial sums join the kernel's
    # existing psum. The rank dim (r <= 64) is never sharded.
    lora_col = {"lora_a": P(), "lora_b": P(None, model_axis)}
    lora_row = {"lora_a": P(model_axis, None), "lora_b": P()}
    return {
        "q": {"kernel": col, "bias": P(model_axis), **lora_col},
        "k": {"kernel": col, **lora_col},
        "v": {"kernel": col, "bias": P(model_axis), **lora_col},
        "attn_out": {"kernel": row, "bias": P(), **lora_row},
        "mlp_in": {"kernel": col, "bias": P(model_axis), **lora_col},
        "mlp_out": {"kernel": row, "bias": P(), **lora_row},
        # MoE layers (ops/moe.py): EXPERT parallelism — the expert dim of
        # the stacked [E, D, F] kernels shards over 'model', so each shard
        # owns E/tp experts and GSPMD exchanges tokens at the dispatch /
        # combine einsums. The router stays replicated (it is [D, E],
        # tiny, and every shard needs all logits).
        "router": {"kernel": P()},
        "moe_in": {"kernel": P(model_axis, None, None), "bias": P(model_axis, None)},
        "moe_out": {"kernel": P(model_axis, None, None), "bias": P(model_axis, None)},
        "ln1": {"scale": P(), "bias": P()},
        "ln2": {"scale": P(), "bias": P()},
        "lambda_1": P(),
        "lambda_2": P(),
        "rel_pos_table": P(),
    }


# Leaves smaller than this stay replicated under FSDP: sharding LN scales
# or tiny biases buys nothing and costs an all-gather dispatch each.
_FSDP_MIN_ELEMENTS = 2 ** 14


def _fsdp_spec(leaf, spec: P, data_axis: str, dp: int) -> P:
    """Extend ``spec`` with the data axis on the leaf's largest dim that is
    still unsharded and divisible by dp (ZeRO-3 at-rest layout). Returns
    ``spec`` unchanged when no dim qualifies or the leaf is small."""
    shape = getattr(leaf, "shape", ())
    if int(np.prod(shape or (0,))) < _FSDP_MIN_ELEMENTS:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if dims[i] is None and shape[i] % dp == 0:
            dims[i] = data_axis
            while dims and dims[-1] is None:
                dims.pop()
            return P(*dims)
    return spec


def detector_param_specs(params: dict, mesh: Mesh, fsdp: bool = False) -> dict:
    """PartitionSpec pytree for a detector parameter pytree.

    Default: replicated (pure DP) unless the mesh has a non-trivial model
    axis (Megatron TP for the encoder). fsdp=True additionally shards each
    large leaf's largest free dim over the DATA axis (ZeRO-3 at-rest
    layout; optimizer state inherits it through jit-ed tx.init). GSPMD
    turns the use sites into all-gathers and the gradients into
    reduce-scatters — no hand-written collectives.
    """
    from layoutdit_tpu.parallel.mesh import data_axis_name, model_axis_name

    model_axis = model_axis_name(mesh)
    tp = model_axis is not None and mesh.shape[model_axis] > 1
    data_axis = data_axis_name(mesh)
    dp = mesh.shape[data_axis] if data_axis is not None else 1
    use_fsdp = fsdp and data_axis is not None and dp > 1

    def spec_for(path, leaf):
        spec = P()
        if tp:
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "vit" in keys and "layers" in keys:
                layer_specs = _vit_layer_specs(model_axis)
                # path like (backbone, vit, layers, <idx>, <block>, <param>)
                for i, k in enumerate(keys):
                    if k in layer_specs:
                        entry = layer_specs[k]
                        if isinstance(entry, dict):
                            spec = entry.get(keys[i + 1], P())
                        else:
                            spec = entry
                        break
            elif "box_head" in keys:
                # TwoMLPHead is the biggest GEMM pair outside the encoder
                # (fc6: [C*P*P, 1024]): same Megatron pattern — fc6
                # column-parallel, fc7 row-parallel (one all-reduce), the
                # tiny predictors stay replicated. The relu in between
                # runs on [K, rep/tp] shards.
                ndim = len(getattr(leaf, "shape", ()))
                if "fc6" in keys:
                    if keys[-1] == "kernel":
                        spec = P(*([None] * (ndim - 1)), model_axis)
                    else:
                        spec = P(model_axis)
                elif "fc7" in keys and keys[-1] == "kernel":
                    spec = P(model_axis, None)
        if use_fsdp:
            spec = _fsdp_spec(leaf, spec, data_axis, dp)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def detector_param_shardings(params: dict, mesh: Mesh, fsdp: bool = False) -> dict:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        detector_param_specs(params, mesh, fsdp=fsdp),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh, fsdp: bool = False) -> dict:
    """Place a parameter pytree according to detector_param_shardings."""
    shardings = detector_param_shardings(params, mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def _path_key_strs(path) -> tuple:
    return tuple(str(k) for k in path)


def opt_state_shardings(tx, params: dict, mesh: Mesh):
    """Shardings for ``tx.init(params)`` mirroring the params' layout.

    ``jax.jit(tx.init)`` does NOT inherit param shardings: the moment
    buffers are ``zeros_like`` outputs, data-unconnected to the inputs, so
    XLA is free to place them on a single device — silently materialising
    the full optimizer state on one chip (the exact thing FSDP/TP exist to
    avoid). Optax states embed params-shaped subtrees (mu/nu/trace) keyed
    by the same paths as the params, so each state leaf whose path ends
    with a param's path (and matches its shape) takes that param's
    sharding; everything else (step counts, empty states) is replicated.

    Use as ``jax.jit(tx.init, out_shardings=opt_state_shardings(...))``.
    """
    replicated = NamedSharding(mesh, P())
    by_suffix = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        by_suffix[_path_key_strs(path)] = (getattr(leaf, "shape", ()), leaf.sharding)

    abstract = jax.eval_shape(tx.init, params)

    def pick(path, leaf):
        keys = _path_key_strs(path)
        for i in range(len(keys)):
            hit = by_suffix.get(keys[i:])
            if hit is not None and hit[0] == leaf.shape:
                return hit[1]
        return replicated

    return jax.tree_util.tree_map_with_path(pick, abstract)


def init_opt_state_sharded(tx, params: dict, mesh: Mesh):
    """``tx.init(params)`` with moment buffers laid out like the params."""
    return jax.jit(
        tx.init, out_shardings=opt_state_shardings(tx, params, mesh)
    )(params)
