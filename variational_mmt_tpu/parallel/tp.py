"""Tensor-parallel sharding rules (2-D ``(data, model)`` mesh).

The reference is single-GPU (SURVEY.md §2.3) so any model parallelism is
beyond-reference; this is the TPU-native "TP where it pays" layout for a
recurrent seq2seq:

- **vocab-parallel generator** (Megatron-style): ``generator/kernel (H, V)``
  is column-sharded over the 'model' axis and the fused CE's logsumexp
  reduction over V becomes one GSPMD all-reduce per row chunk. At real
  vocab sizes the H->V projection is the single largest GEMM in the step
  (2·H·V FLOPs/token vs 2·H·3H per recurrent layer), and the two
  embedding tables are the largest parameter buffers — sharding them
  divides both the FLOPs and the HBM footprint by the TP degree.
- **vocab-sharded embedding tables**: ``{src,tgt}_embed/embedding (V, E)``
  row-sharded on V. GSPMD lowers the gather to a local-gather + masked
  all-reduce. Consistent with the three-way weight tie: a tied generator
  reads ``tgt_embed`` transposed, so P('model', None) on the table IS
  P(None, 'model') on the generator kernel.
- **recurrent cells stay replicated**: an H=500 GRU chain is
  latency-bound; slicing its per-step (H, 3H) GEMMs across chips would put
  an ICI collective inside every step of a serial scan — slower than the
  GEMM it shards. TP here applies to the big parallelizable GEMMs only.

No hand-written collectives anywhere: the rules below only annotate
parameter shardings; XLA/GSPMD inserts the all-reduces. See
tests/test_tp.py for the TP==single-device equivalence proof on the
virtual 8-device mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (path suffix, spec) — first match wins; anything unmatched is replicated.
TP_RULES = (
    ("src_embed/embedding", P(MODEL_AXIS, None)),
    ("tgt_embed/embedding", P(MODEL_AXIS, None)),
    ("generator/kernel", P(None, MODEL_AXIS)),
    ("generator/bias", P(MODEL_AXIS)),
    # tied generator (share_decoder_embeddings): the standalone (V,) bias
    # must shard like generator/bias, or the tied layout diverges from the
    # untied one on the vocab axis
    ("gen_bias", P(MODEL_AXIS)),
)


def make_mesh_2d(n_data: int, n_model: int, data_axis: str = "data") -> Mesh:
    """(n_data, n_model) mesh; total must not oversubscribe the host."""
    devs = jax.devices()
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(
            f"requested {n_data}x{n_model} mesh but only {len(devs)} "
            f"devices are available"
        )
    return Mesh(np.array(devs[:need]).reshape(n_data, n_model),
                (data_axis, MODEL_AXIS))


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def spec_for(path_str: str, leaf_ndim: int, mesh: Mesh) -> P:
    if MODEL_AXIS in mesh.axis_names:
        # weight-only int8 (decode/translator.py quantize_params_int8)
        # replaces a leaf W at path p with {p/int8, p/scale}: the int8
        # tensor keeps W's shape so it shards like W; the per-output-
        # channel scale is 1-D over W's LAST axis so it takes the last
        # component of W's spec (e.g. generator/kernel P(None, 'model')
        # -> scale P('model'); embedding P('model', None) -> scale
        # replicated). This is what lets -infer_dtype int8 compose with
        # tensor-parallel decode.
        base, quant = path_str, None
        if path_str.endswith(("/int8", "/scale")):
            base, quant = path_str.rsplit("/", 1)
        for suffix, spec in TP_RULES:
            # component-boundary match: "generator/kernel" must not claim a
            # hypothetical "pre_generator/kernel"
            if base == suffix or base.endswith("/" + suffix):
                if quant == "scale":
                    return P(spec[-1]) if len(spec) else P()
                if leaf_ndim < len(spec):
                    break  # rank mismatch (e.g. scalar stand-in) -> replicate
                return spec
    return P()


def tree_shardings(tree_tpl: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``tree_tpl`` (arrays or ShapeDtypeStructs,
    e.g. from jax.eval_shape) under the TP rules. On a 1-D data mesh this
    degenerates to fully-replicated — the DP layout round 2 shipped."""

    def f(path, leaf):
        return NamedSharding(mesh, spec_for(_path_str(path), leaf.ndim, mesh))

    return jax.tree_util.tree_map_with_path(f, tree_tpl)


def validate_tp_divisibility(cfg_model, n_model: int) -> None:
    """Vocab dims must split evenly across the model axis (GSPMD would pad,
    but a silently padded generator changes the CE normalizer)."""
    if n_model <= 1:
        return
    for name, v in (("src_vocab_size", cfg_model.src_vocab_size),
                    ("tgt_vocab_size", cfg_model.tgt_vocab_size)):
        if v % n_model != 0:
            raise ValueError(
                f"model.{name} ({v}) must be divisible by the tensor-"
                f"parallel degree ({n_model}); pad the vocab to "
                f"{((v + n_model - 1) // n_model) * n_model} "
                f"(preprocess -vocab_pad_multiple {n_model})"
            )
