"""SIREN MLP as a JAX pytree.

Same math and initialization scheme as the reference model
(reference LBDRNmodel.py:7-82, itself after lucidrains/siren-pytorch):

- ``num_layers`` hidden layers: ``sin(w0 * (x @ W + b))`` with w0 = 30,
- final layer: ``sigmoid(x @ W + b)`` (the reference wraps the final linear
  in a SirenLayer whose activation is Sigmoid, so w0 does not apply there),
- init: W, b ~ U(-s, s) with s = 1/dim_in for the first layer and
  s = sqrt(c/dim_in)/w0 (c = 6) otherwise.

TPU notes: the input dimension is zero-padded to a multiple of 128 (MXU lane
width).  Padded input columns are zero, so the extra weight rows receive zero
gradient and stay exactly zero under Adam — the padded network computes the
same function as the unpadded one (up to reduction order) with every matmul
MXU-aligned.
Serialization (`flatten_params`) strips the padding and emits tensors in the
reference's state-dict iteration order (weight before bias, layer by layer,
torch (out, in) row-major layout — reference encode.py:124-128 /
decode.py:114-120) so weight streams are layout-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import ModelSpec

MXU_LANE = 128


def pad_dim(d: int, multiple: int = MXU_LANE) -> int:
    return ((d + multiple - 1) // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SirenParams:
    """weights[i]: (in_i, out_i); biases[i]: (out_i,). Layer 0 is padded."""

    weights: List[jnp.ndarray]
    biases: List[jnp.ndarray]


def init_params(
    key: jax.Array,
    dim_in: int,
    dim_out: int,
    spec: ModelSpec,
    pad_input_to: int | None = None,
) -> SirenParams:
    """Initialize with the SIREN scheme; input dim padded for the MXU."""
    bc = spec.base_channel
    dims = [dim_in] + [bc] * spec.num_layers + [dim_out]
    padded_in = pad_dim(dim_in) if pad_input_to is None else pad_input_to
    weights, biases = [], []
    for layer in range(len(dims) - 1):
        d_in, d_out = dims[layer], dims[layer + 1]
        is_first = layer == 0
        w0 = spec.w0_initial if is_first else spec.w0
        s = (1.0 / d_in) if is_first else (np.sqrt(spec.c / d_in) / w0)
        key, kw, kb = jax.random.split(key, 3)
        w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -s, s)
        b = jax.random.uniform(kb, (d_out,), jnp.float32, -s, s)
        if is_first and padded_in > d_in:
            w = jnp.concatenate(
                [w, jnp.zeros((padded_in - d_in, d_out), jnp.float32)], axis=0
            )
        weights.append(w)
        biases.append(b)
    return SirenParams(weights=weights, biases=biases)


def _sin(z, fast_act: bool):
    if fast_act:
        from lbdrn_msic_tpu.ops.fused_step import sincos

        return sincos(z)[0]
    return jnp.sin(z)


def forward(
    params: SirenParams, x: jnp.ndarray, spec: ModelSpec,
    fast_act: bool = False,
) -> jnp.ndarray:
    """x: (B, padded_dim_in) -> (B, dim_out).  Hidden sin(w0*z), final sigmoid.

    `fast_act=True` swaps jnp.sin for the fused kernels' poly `sincos`
    (ops/fused_step.py, |err| < ~2e-6 at SIREN preactivation ranges) — used
    by the training loop's eval passes on the fused path so best-epoch
    selection sees the same activation the training steps used.  Decode
    keeps the default exact path.
    """
    n = len(params.weights)
    h = x
    for i in range(n - 1):
        w0 = spec.w0_initial if i == 0 else spec.w0
        z = (
            jnp.dot(h, params.weights[i], precision=jax.lax.Precision.HIGHEST)
            + params.biases[i]
        )
        h = _sin(w0 * z, fast_act)
    z = (
        jnp.dot(h, params.weights[-1], precision=jax.lax.Precision.HIGHEST)
        + params.biases[-1]
    )
    return jax.nn.sigmoid(z)


def forward_experts(
    params: SirenParams, x: jnp.ndarray, spec: ModelSpec,
    fast_act: bool = False,
) -> jnp.ndarray:
    """Batched-expert forward: params leaves carry a leading expert axis E
    (weights[i]: (E, in_i, out_i); biases[i]: (E, out_i)); x: (E, B, padded).

    One einsum per layer runs all experts' matmuls in a single MXU kernel —
    the scale-out shape for training many tiny independent networks (the
    rate points of an RD sweep) on one chip.  Same math/precision as
    `forward` per expert slice.
    """
    n = len(params.weights)
    h = x
    for i in range(n - 1):
        w0 = spec.w0_initial if i == 0 else spec.w0
        z = (
            jnp.einsum(
                "ebi,eio->ebo", h, params.weights[i],
                precision=jax.lax.Precision.HIGHEST,
            )
            + params.biases[i][:, None, :]
        )
        h = _sin(w0 * z, fast_act)
    z = (
        jnp.einsum(
            "ebi,eio->ebo", h, params.weights[-1],
            precision=jax.lax.Precision.HIGHEST,
        )
        + params.biases[-1][:, None, :]
    )
    return jax.nn.sigmoid(z)


def stack_params(params_list: List[SirenParams]) -> SirenParams:
    """Stack per-expert params along a new leading expert axis."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *params_list)


def unstack_params(params: SirenParams, e: int) -> SirenParams:
    """Slice expert e out of stacked params."""
    return jax.tree.map(lambda l: l[e], params)


def pad_features(x: jnp.ndarray, padded_dim: int) -> jnp.ndarray:
    """Zero-pad the feature axis to the model's padded input width."""
    d = x.shape[-1]
    if d == padded_dim:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((*x.shape[:-1], padded_dim - d), x.dtype)], axis=-1
    )


def param_count(dim_in: int, dim_out: int, spec: ModelSpec) -> int:
    return spec.param_count(dim_in, dim_out)


def flatten_params(params: SirenParams, dim_in: int) -> np.ndarray:
    """Serialize to a flat float32 vector in reference state-dict order.

    Reference order (encode.py:124-128): for each layer, weight then bias;
    weight stored as torch (out, in) row-major.  Padded input rows of layer 0
    are stripped.  All tensors come off the device in ONE transfer
    (device_get of the pytree) — per-tensor fetches each pay full link
    latency on remote-attached TPUs.
    """
    import jax

    host = jax.device_get(params)
    out = []
    for i, (w, b) in enumerate(zip(host.weights, host.biases)):
        w = np.asarray(w)
        if i == 0:
            w = w[:dim_in]
        out.append(w.T.reshape(-1))  # (out, in) row-major
        out.append(np.asarray(b).reshape(-1))
    return np.concatenate(out).astype(np.float32)


def unflatten_params(
    flat: np.ndarray,
    dim_in: int,
    dim_out: int,
    spec: ModelSpec,
    pad_input_to: int | None = None,
) -> SirenParams:
    """Inverse of flatten_params; re-applies MXU input padding."""
    bc = spec.base_channel
    dims = [dim_in] + [bc] * spec.num_layers + [dim_out]
    padded_in = pad_dim(dim_in) if pad_input_to is None else pad_input_to
    weights, biases = [], []
    k = 0
    for layer in range(len(dims) - 1):
        d_in, d_out = dims[layer], dims[layer + 1]
        w = flat[k : k + d_in * d_out].reshape(d_out, d_in).T.astype(np.float32)
        k += d_in * d_out
        b = flat[k : k + d_out].astype(np.float32)
        k += d_out
        if layer == 0 and padded_in > d_in:
            w = np.concatenate([w, np.zeros((padded_in - d_in, d_out), np.float32)])
        weights.append(jnp.asarray(w))
        biases.append(jnp.asarray(b))
    if k != flat.size:
        raise ValueError(f"parameter vector length {flat.size} != expected {k}")
    return SirenParams(weights=weights, biases=biases)
