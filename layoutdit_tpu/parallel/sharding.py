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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def _vit_layer_specs(model_axis: str) -> dict:
    col = P(None, model_axis)  # output-dim sharded
    row = P(model_axis, None)  # input-dim sharded
    return {
        "q": {"kernel": col, "bias": P(model_axis)},
        "k": {"kernel": col},
        "v": {"kernel": col, "bias": P(model_axis)},
        "attn_out": {"kernel": row, "bias": P()},
        "mlp_in": {"kernel": col, "bias": P(model_axis)},
        "mlp_out": {"kernel": row, "bias": P()},
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


def detector_param_specs(params: dict, mesh: Mesh) -> dict:
    """PartitionSpec pytree for a detector parameter pytree.

    With model_parallel == 1 everything is replicated (pure DP).
    """
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    tp = model_axis is not None and mesh.shape[model_axis] > 1

    def spec_for(path, leaf):
        if not tp:
            return P()
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "vit" in keys and "layers" in keys:
            layer_specs = _vit_layer_specs(model_axis)
            # path like (backbone, vit, layers, <idx>, <block>, <param>)
            for i, k in enumerate(keys):
                if k in layer_specs:
                    entry = layer_specs[k]
                    if isinstance(entry, dict):
                        return entry.get(keys[i + 1], P())
                    return entry
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def detector_param_shardings(params: dict, mesh: Mesh) -> dict:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        detector_param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a parameter pytree according to detector_param_shardings."""
    shardings = detector_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
