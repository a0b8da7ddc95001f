"""Pallas depthwise-conv kernel parity (CPU interpret mode).

The on-chip stamp lives in BENCH_NOTES "Kernel parity on hardware"
(tools/restamp_kernels.py); these tests keep the kernel logic itself honest
in CI: interpret mode runs the same Pallas program without a TPU.
Reference semantics: the conformer's k=31 'SAME'-padded depthwise temporal
conv (reference: modules/conv/base_conv.py depthwise branch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from some_tpu.ops.depthwise import depthwise_conv1d


def _numpy_depthwise(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """float64 oracle: y[b,t,c] = sum_k x_pad[b, t+k, c] * w[k, c]."""
    B, T, C = x.shape
    k = w.shape[0]
    half = (k - 1) // 2
    xp = np.pad(x.astype(np.float64), ((0, 0), (half, k - 1 - half), (0, 0)))
    y = np.zeros((B, T, C))
    for tap in range(k):
        y += xp[:, tap:tap + T, :] * w[tap].astype(np.float64)
    return y


@pytest.mark.parametrize("T,C,k", [(512, 64, 31), (128, 16, 7), (64, 8, 3)])
def test_interpret_matches_oracle_and_xla(T, C, k):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C)) * 0.1, jnp.float32)
    want = _numpy_depthwise(np.asarray(x), np.asarray(w))
    got_pl = np.asarray(depthwise_conv1d(x, w, impl="pallas_interpret"))
    got_xla = np.asarray(depthwise_conv1d(x, w, impl="xla"))
    np.testing.assert_allclose(got_pl, want, atol=5e-6)
    np.testing.assert_allclose(got_xla, want, atol=5e-6)
    np.testing.assert_allclose(got_pl, got_xla, atol=2e-6)


def test_interpret_vjp_matches_xla_autodiff():
    """The hand-written VJP (time-flipped forward for dx, per-tap reductions
    for dw) must agree with autodiff of the plain XLA conv."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 128, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 16)) * 0.1, jnp.float32)

    def loss(impl, x, w):
        y = depthwise_conv1d(x, w, impl)
        return jnp.sum(jnp.sin(y) * y)

    gx_pl, gw_pl = jax.grad(lambda x, w: loss("pallas_interpret", x, w),
                            argnums=(0, 1))(x, w)
    gx_xla, gw_xla = jax.grad(lambda x, w: loss("xla", x, w),
                              argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_xla),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_xla),
                               atol=1e-4)


def test_bf16_path_runs_and_is_close():
    rng = np.random.default_rng(3)
    x32 = rng.standard_normal((1, 256, 32)).astype(np.float32)
    w32 = (rng.standard_normal((31, 32)) * 0.1).astype(np.float32)
    want = _numpy_depthwise(x32, w32)
    got = np.asarray(depthwise_conv1d(
        jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16),
        "pallas_interpret"), np.float32)
    # bf16 inputs, f32 accumulation, bf16 output: ~1e-2 relative
    np.testing.assert_allclose(got, want, atol=5e-2)
