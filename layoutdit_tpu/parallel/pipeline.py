"""Pipeline parallelism for the ViT encoder (GPipe schedule, TPU-native).

The reference has no pipeline parallelism (SURVEY.md §2.3: "absent"); this
is new scaling capability for deep/high-res encoders (dit-large at 1024 px)
where tensor parallelism alone runs out of useful width.

Design — the stacked-stage SPMD pipeline (the standard JAX formulation,
cf. the public scaling-book recipe), not a torch-style per-rank module
split:

  * the L encoder layers are STACKED into a single pytree with a leading
    layer axis and sharded over the mesh's ``pipe`` axis — stage ``s``
    physically holds layers ``[s*L/S, (s+1)*L/S)``;
  * inside one ``shard_map``, every stage runs the SAME program
    (SPMD): at tick ``t`` stage ``s`` applies its layers to the microbatch
    it received, writes the per-layer outputs into its slot buffer, and
    ``ppermute``-shifts its boundary activation to stage ``s+1`` over ICI;
  * stage 0 injects microbatch ``t`` from the embedded input; after
    ``T = M + S - 1`` ticks every microbatch has flowed through every
    stage (the classic GPipe bubble of ``(S-1)/(M+S-1)``);
  * per-layer outputs come back as one ``[L, B, N, D]`` array (layer axis
    sharded over ``pipe``), so the detector's mid-stack FPN taps (layers
    d/3, d/2, 2d/3, d — reference dit_backbone.py:33-34) keep working
    even when a tap is interior to a stage.

Everything is ``lax.scan``/``ppermute``/``dynamic_update_slice`` — fully
jit-compatible and differentiable, so the same schedule serves training
(backward flows through the transposed ppermutes, i.e. the reverse
pipeline) and inference.  Composes with data parallelism (batch stays
sharded over ``data``; each stage pipelines its local shard) and with
tensor parallelism on a ``('data','model','pipe')`` mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """How to pipeline the encoder. Pass as ``vit_forward(pipeline=...)``
    (threaded through detector_loss/detector_predict like seq_sharding)."""

    mesh: Mesh
    # Microbatches per (local) batch. The GPipe bubble is (S-1)/(M+S-1):
    # more microbatches -> smaller bubble, smaller per-tick matmuls.
    n_microbatches: int = 4
    pipe_axis: str = "pipe"
    data_axis: str = "data"
    # Rematerialize each stage-tick in the backward pass (GPipe's
    # activation-memory trade: keep only boundary activations live).
    remat: bool = False

    @property
    def n_stages(self) -> int:
        return self.mesh.shape[self.pipe_axis]


def stack_layer_params(layers: list[dict]) -> dict:
    """Stack per-layer param dicts into one pytree with a leading layer
    axis (requires homogeneous layers — true within a checkpoint family)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def shard_stacked_layers(stacked: dict, pcfg: PipelineConfig) -> dict:
    """Place the stacked layers with the layer axis sharded over 'pipe'."""
    def put(x):
        spec = P(pcfg.pipe_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(pcfg.mesh, spec))

    return jax.tree_util.tree_map(put, stacked)


def pipeline_encoder(
    stacked: dict,
    x: jnp.ndarray,
    cfg,
    pcfg: PipelineConfig,
    rel_grid=None,
    shared_bias=None,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """Run the stacked encoder layers over the pipeline.

    stacked: layer params stacked on a leading [L] axis (layer axis
      sharded over ``pipe`` — ``shard_stacked_layers``; unsharded also
      works, GSPMD resheds it).
    x: [B, N, D] embedded tokens (batch sharded over ``data`` or
      replicated).
    Returns hs: [L, B, N, D] — output of every layer, layer axis sharded
    over ``pipe`` (indexed by the caller for taps).
    """
    from layoutdit_tpu.models.vit import _layer_rel_bias, encoder_block

    mesh = pcfg.mesh
    S = pcfg.n_stages
    M = pcfg.n_microbatches
    L = cfg.num_hidden_layers
    if L % S != 0:
        raise ValueError(f"num layers {L} not divisible by {S} stages")
    Lp = L // S
    dp = mesh.shape.get(pcfg.data_axis, 1)
    B, N, D = x.shape
    if (B // dp) % M != 0:
        raise ValueError(
            f"local batch {B}//{dp} not divisible by {M} microbatches"
        )

    # Per-layer rel-pos bias cannot be gathered outside (it is per-stage
    # data); gather it inside the stage from the stacked tables. The
    # SHARED table's bias is stage-invariant -> computed once, broadcast.
    def run_stage(local_layers, state, sb):
        h = state
        outs = []
        for i in range(Lp):
            layer = jax.tree_util.tree_map(lambda a, i=i: a[i], local_layers)
            bias = _layer_rel_bias(layer, cfg, rel_grid, sb)
            h = encoder_block(h, layer, cfg, bias, attention_impl)
            outs.append(h)
        return h, jnp.stack(outs)  # [Lp, mb, N, D]

    if pcfg.remat:
        run_stage = jax.checkpoint(run_stage)

    def staged(local_layers, xl, shared_bias_l=None):
        # xl: [Bl, N, D] (this data-shard's batch)
        s = jax.lax.axis_index(pcfg.pipe_axis)
        Bl = xl.shape[0]
        mb = Bl // M
        xmb = xl.reshape(M, mb, N, D)
        state = jnp.zeros((mb, N, D), xl.dtype)
        outbuf = jnp.zeros((Lp, M, mb, N, D), xl.dtype)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 injects microbatch t (junk past M — never stored:
            # its result would reach stage s at tick t+s > M+S-2).
            inject = jax.lax.dynamic_index_in_dim(
                xmb, jnp.clip(t, 0, M - 1), keepdims=False
            )
            state = jnp.where(s == 0, inject, state)
            state_out, ys = run_stage(local_layers, state, shared_bias_l)
            # store this tick's per-layer outputs at microbatch slot
            # t - s, but ONLY inside the stage's live window [s, s+M-1]
            # (warmup/drain ticks compute junk that must not overwrite
            # valid slots — the write is select-guarded at slice size).
            idx = jnp.clip(t - s, 0, M - 1)
            live = (t >= s) & (t <= s + M - 1)
            cur = jax.lax.dynamic_slice(
                outbuf, (0, idx, 0, 0, 0), (Lp, 1, mb, N, D)
            )
            upd = jnp.where(live, ys[:, None], cur)
            outbuf = jax.lax.dynamic_update_slice(
                outbuf, upd, (0, idx, 0, 0, 0)
            )
            # shift boundary activation to the next stage over ICI
            state = jax.lax.ppermute(state_out, pcfg.pipe_axis, fwd)
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(M + S - 1)
        )
        return outbuf.reshape(Lp, M * mb, N, D)

    # Specs: layer axis over 'pipe'; batch over 'data'; everything else
    # replicated. check_vma=False: ppermute + axis_index make per-device
    # values intentionally divergent.
    def lspec(a):
        return P(pcfg.pipe_axis, *([None] * (a.ndim - 1)))

    layer_specs = jax.tree_util.tree_map(lspec, stacked)
    out_spec = P(pcfg.pipe_axis, pcfg.data_axis, None, None)
    if shared_bias is None:
        hs = jax.shard_map(
            staged,
            mesh=mesh,
            in_specs=(layer_specs, P(pcfg.data_axis, None, None)),
            out_specs=out_spec,
            check_vma=False,
        )(stacked, x)
    else:
        hs = jax.shard_map(
            staged,
            mesh=mesh,
            in_specs=(layer_specs, P(pcfg.data_axis, None, None), P()),
            out_specs=out_spec,
            check_vma=False,
        )(stacked, x, shared_bias)
    return hs  # [L, B, N, D]
