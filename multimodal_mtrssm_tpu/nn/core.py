"""Functional NN primitives: Dense, MLP, GRUCell, MTRNNCell.

Pure init/apply pairs over plain nested-dict parameter pytrees — no module
framework. This keeps every model compatible with ``lax.scan`` carries,
``jax.grad`` donation, and ``pjit`` sharding annotations with zero lifting
machinery.

These replace the reference's external compute deps (reference
``pyproject.toml:8-11``): ``torchrl.modules.MLP`` (usage contract at
reference ``src/multimodal_rssm/models/networks.py:57-64,130-145``) and
``torch.nn.GRUCell`` (reference ``networks.py:126-129``), plus the MTRNN
leaky-integrator cell (reference
``src/multimodal_rssm/models/mmtrssm/mopoe_mmtrssm/core.py:12-74``).

Initialization follows torch's fan-in uniform (``U(-1/sqrt(fan_in),
1/sqrt(fan_in))``) so optimizer dynamics land in the same regime as the
reference even though bit-identical init is impossible across frameworks.

Compute dtype policy: parameters are stored float32; ``apply`` functions cast
to the caller's compute dtype (bf16 on TPU MXU) via the input dtype, except
where a docstring says f32 is forced.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# ---------------------------------------------------------------------------
# Activations (name-keyed for YAML-config compatibility with the reference's
# `activation_name: ELU` style fields, reference configs/default.yaml:14 etc.)
# ---------------------------------------------------------------------------

ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "ELU": jax.nn.elu,
    "ReLU": jax.nn.relu,
    "GELU": jax.nn.gelu,
    "SiLU": jax.nn.silu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
    "LeakyReLU": jax.nn.leaky_relu,
    "Identity": lambda x: x,
}


def activation(name: str) -> Callable[[jax.Array], jax.Array]:
    """Look up an activation by its torch-style class name."""
    try:
        return ACTIVATIONS[name]
    except KeyError as e:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)}") from e


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def _fan_in_uniform(key: jax.Array, shape: tuple[int, ...], fan_in: int) -> jax.Array:
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(max(fan_in, 1))))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dense_init(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    """Linear layer params, torch ``nn.Linear``-style fan-in uniform init."""
    kw, kb = jax.random.split(key)
    return {
        "w": _fan_in_uniform(kw, (in_dim, out_dim), in_dim),
        "b": _fan_in_uniform(kb, (out_dim,), in_dim),
    }


def dense_apply(params: Params, x: jax.Array) -> jax.Array:
    """x @ w + b with weights cast to the activation dtype (bf16-safe)."""
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return x @ w + b


# ---------------------------------------------------------------------------
# MLP (torchrl.modules.MLP contract: depth hidden layers of `num_cells`,
# activation between layers, optional activation after the last layer)
# ---------------------------------------------------------------------------


def mlp_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    num_cells: int | list[int],
    depth: int | None = None,
) -> Params:
    """Init an MLP. ``depth=1`` ⇒ ``[Linear(in,cells), act, Linear(cells,out)]``.

    Matches torchrl's ``MLP(in_features, out_features, num_cells, depth)``
    shape contract (reference ``networks.py:57-64``: depth counts hidden
    layers, each of width ``num_cells``).
    """
    if isinstance(num_cells, int):
        if depth is None:
            depth = 1
        cells = [num_cells] * depth
    else:
        cells = list(num_cells)
    dims = [in_dim, *cells, out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [dense_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)],
    }


def mlp_apply(
    params: Params,
    x: jax.Array,
    act: Callable[[jax.Array], jax.Array] | str = "ELU",
    activate_last: bool = False,
) -> jax.Array:
    """Apply an MLP; activation between layers, optionally after the last."""
    if isinstance(act, str):
        act = activation(act)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = dense_apply(layer, x)
        if i < len(layers) - 1 or activate_last:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# GRU cell (torch nn.GRUCell semantics, reference networks.py:126-129,170)
# ---------------------------------------------------------------------------


def gru_init(key: jax.Array, input_dim: int, hidden_dim: int) -> Params:
    """GRU cell params; gate order (r, z, n) to match torch's layout."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # torch initializes all GRUCell params U(-1/sqrt(hidden), 1/sqrt(hidden)).
    return {
        "w_ih": _fan_in_uniform(k1, (input_dim, 3 * hidden_dim), hidden_dim),
        "w_hh": _fan_in_uniform(k2, (hidden_dim, 3 * hidden_dim), hidden_dim),
        "b_ih": _fan_in_uniform(k3, (3 * hidden_dim,), hidden_dim),
        "b_hh": _fan_in_uniform(k4, (3 * hidden_dim,), hidden_dim),
    }


def gru_apply(params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step: ``h' = (1-z)*n + z*h`` with torch gate equations."""
    dtype = h.dtype
    gi = x @ params["w_ih"].astype(dtype) + params["b_ih"].astype(dtype)
    gh = h @ params["w_hh"].astype(dtype) + params["b_hh"].astype(dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


# ---------------------------------------------------------------------------
# MTRNN cell (leaky integrator, reference mopoe_mmtrssm/core.py:40-74)
# ---------------------------------------------------------------------------


def mtrnn_init(key: jax.Array, input_dim: int, hidden_dim: int) -> Params:
    """MTRNN cell params: ``d2h`` (hidden→hidden) and ``input2h`` linears."""
    k1, k2 = jax.random.split(key)
    return {
        "d2h": dense_init(k1, hidden_dim, hidden_dim),
        "input2h": dense_init(k2, input_dim, hidden_dim),
    }


def mtrnn_apply(
    params: Params,
    x: jax.Array,
    prev_d: jax.Array,
    hidden: jax.Array,
    tau: float,
) -> tuple[jax.Array, jax.Array]:
    """One MTRNN step (reference ``core.py:59-61``).

    ``hidden' = (1 - 1/tau) * hidden + (d2h(prev_d) + input2h(x)) / tau``
    ``d = tanh(hidden')``

    Returns ``(d, hidden')`` — the hidden integrator is an explicit carry,
    functionalizing the reference's mutable ``self.hidden``.
    """
    if tau <= 1.0:
        raise ValueError("tau must be greater than 1.0")  # reference core.py:34
    inv_tau = 1.0 / tau
    new_hidden = (1.0 - inv_tau) * hidden + (
        dense_apply(params["d2h"], prev_d) + dense_apply(params["input2h"], x)
    ) * inv_tau
    return jnp.tanh(new_hidden), new_hidden


def rssm_transition_core(
    transition: Params,
    action: jax.Array,
    prev_stoch: jax.Array,
    prev_deter: jax.Array,
    activation_name: str,
) -> tuple[jax.Array, jax.Array]:
    """Shared RSSM transition chain: MLP(cat(action, stoch)) → GRU → prior
    head (reference ``networks.py:151-173``). One home for every family
    (MoPoE-MRSSM, unimodal RSSM) so a parity fix cannot miss a sibling."""
    x = jnp.concatenate([action, prev_stoch], axis=-1)
    x = mlp_apply(transition["action_state_projector"], x, activation_name)
    deter = gru_apply(transition["gru"], x, prev_deter)
    logits = mlp_apply(transition["rnn_to_prior_projector"], deter, activation_name)
    return deter, logits
