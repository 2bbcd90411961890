"""Signal-core tests: PQMF round trip, STFT, spectral distance, samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topo_audio_autoencoder_tpu.ops import (
    PQMF,
    multiscale_stft,
    stft_magnitude,
    spectral_distance,
    spectral_distance_matrix_block,
    binary_gumbel,
    hard_concrete,
    straight_through,
    temperature_schedule,
    hard_concrete_fused,
)
from topo_audio_autoencoder_tpu.ops.pqmf import (
    _modulate,
    _np_analysis,
    _np_synthesis,
    design_prototype,
)


@pytest.fixture(scope="module")
def pqmf4():
    # small band count keeps the host-side design fast in tests
    return PQMF.create(attenuation=100.0, n_band=4)


# ---------------------------------------------------------------- PQMF


def test_pqmf_design_quality(pqmf4):
    # near-perfect reconstruction: the design loop itself must report small
    # error; 100 dB attenuation should land well below -60 dB.
    assert pqmf4.recon_error < 1e-3


def test_pqmf_roundtrip(pqmf4, rng):
    t = 4096
    x = rng.standard_normal((2, 1, t)).astype(np.float32)
    z = pqmf4.forward(jnp.array(x))
    assert z.shape == (2, 4, t // 4)
    y = pqmf4.inverse(z)
    assert y.shape == x.shape
    # steady-state (interior) error is the filter-quality signal; the
    # zero-padded edges carry an O(1e-2) transient inherent to any finite
    # conv filterbank.
    n = pqmf4.taps
    s = slice(2 * n, t - 2 * n)
    ya, xa = np.asarray(y)[..., s], x[..., s]
    err = np.linalg.norm(ya - xa) / np.linalg.norm(xa)
    assert err < 1e-3, f"round-trip interior relative error {err}"
    full = np.linalg.norm(np.asarray(y) - x) / np.linalg.norm(x)
    assert full < 2e-2, f"round-trip full relative error {full}"


def test_pqmf_matches_numpy_reference(pqmf4, rng):
    """JAX strided conv == the host-side correlation-semantics reference."""
    t = 1024
    x = rng.standard_normal(t).astype(np.float32)
    ref_z = _np_analysis(x, pqmf4.filters, 4)
    z = np.asarray(pqmf4.forward(jnp.array(x)[None, None]))[0]
    np.testing.assert_allclose(z, ref_z, rtol=1e-4, atol=1e-5)

    ref_y = _np_synthesis(ref_z, pqmf4.filters, 4)
    y = np.asarray(pqmf4.inverse(jnp.array(ref_z)[None]))[0, 0]
    np.testing.assert_allclose(y, ref_y, rtol=1e-4, atol=1e-4)


def test_pqmf_band_separation(pqmf4):
    """A pure tone in band k's passband concentrates energy in subband k."""
    t = 8192
    fs = 2.0  # normalized
    n = np.arange(t)
    m = 4
    for k in range(m):
        center = (2 * k + 1) / (2 * m) * 0.5  # band center, cycles/sample
        x = np.sin(2 * np.pi * center * n).astype(np.float32)
        z = np.asarray(pqmf4.forward(jnp.array(x)[None, None]))[0]
        energies = (z**2).sum(axis=1)
        assert energies.argmax() == k


# ---------------------------------------------------------------- STFT


def test_stft_shapes(rng):
    x = jnp.array(rng.standard_normal((3, 4096)), dtype=jnp.float32)
    s = stft_magnitude(x, 512)
    # centered, hop=128: frames = 4096/128 + 1
    assert s.shape == (3, 4096 // 128 + 1, 257)
    specs = multiscale_stft(x, (512, 256))
    assert len(specs) == 2


def test_stft_matmul_matches_fft(rng):
    """The MXU (DFT-matmul) STFT path must agree with the FFT path."""
    x = jnp.array(rng.standard_normal((2, 4096)), dtype=jnp.float32)
    for n in (1024, 256):
        a = stft_magnitude(x, n, method="fft")
        b = stft_magnitude(x, n, method="matmul")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stft_parseval_sine(rng):
    """A unit sine's magnitude STFT peaks at the right bin."""
    t, n_fft = 8192, 1024
    freq_bin = 100
    x = np.sin(2 * np.pi * freq_bin * np.arange(t) / n_fft).astype(np.float32)
    s = np.asarray(stft_magnitude(jnp.array(x)[None], n_fft))[0]
    mid_frames = s[4:-4]
    assert np.all(mid_frames.argmax(axis=-1) == freq_bin)


def test_spectral_distance_properties(rng):
    x = jnp.array(rng.standard_normal((2, 4096)), dtype=jnp.float32)
    y = jnp.array(rng.standard_normal((2, 4096)), dtype=jnp.float32)
    scales = (512, 256)
    d_xx = spectral_distance(x, x, scales)
    d_xy = spectral_distance(x, y, scales)
    assert d_xx.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_xx), 0.0, atol=1e-5)
    assert np.all(np.asarray(d_xy) > 0.1)


def test_distance_matrix_block_consistency(rng):
    """Block pairwise distances == per-pair spectral_distance."""
    xs = jnp.array(rng.standard_normal((3, 2048)), dtype=jnp.float32)
    scales = (512, 256)
    mat = np.asarray(spectral_distance_matrix_block(xs, xs, scales))
    for i in range(3):
        for j in range(3):
            d = float(spectral_distance(xs[i][None], xs[j][None], scales)[0])
            np.testing.assert_allclose(mat[i, j], d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.diag(mat), 0.0, atol=1e-5)


# ---------------------------------------------------------------- samplers


def test_temperature_schedule():
    assert float(temperature_schedule(0, 5.0, 0.1, 0.95)) == 5.0
    assert float(temperature_schedule(1000, 5.0, 0.1, 0.95)) == pytest.approx(0.1)


def test_binary_gumbel_stats():
    key = jax.random.PRNGKey(0)
    n = 20000
    # logits 0.5 -> 2l-1 = 0 -> expected mean 0.5
    probs = binary_gumbel(jnp.full((n,), 0.5), key, 1.0, training=True)
    assert 0.45 < float(probs.mean()) < 0.55
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
    # eval: deterministic threshold at 0.5
    hard = binary_gumbel(jnp.array([0.2, 0.7]), None, 1.0, training=False)
    np.testing.assert_array_equal(np.asarray(hard), [0.0, 1.0])


def test_binary_gumbel_low_temp_saturates():
    key = jax.random.PRNGKey(1)
    probs = binary_gumbel(jnp.full((1000,), 3.0), key, 0.01, training=True)
    assert float(probs.mean()) > 0.95


def test_hard_concrete_support():
    key = jax.random.PRNGKey(2)
    z = hard_concrete(jnp.zeros(20000), key, 0.5, training=True)
    z = np.asarray(z)
    assert np.all((z >= 0) & (z <= 1))
    # stretch makes exact 0/1 happen with positive probability
    assert (z == 0).mean() > 0.01
    assert (z == 1).mean() > 0.01
    # strongly negative log-alpha -> gates almost surely 0
    z0 = np.asarray(hard_concrete(jnp.full((5000,), -10.0), key, 0.5, training=True))
    assert (z0 == 0).mean() > 0.95


def test_hard_concrete_fused_cpu_fallback():
    """On CPU the fused wrapper must dispatch to the pure-JAX sampler."""
    key = jax.random.PRNGKey(3)
    z = hard_concrete_fused(jnp.zeros((4, 37)), key, 0.5, training=True)
    assert z.shape == (4, 37)
    ref = hard_concrete(jnp.zeros((4, 37)), key, 0.5, training=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref))


def test_straight_through_gradient():
    def f(x):
        soft = jax.nn.sigmoid(x)
        hard = (soft > 0.5).astype(x.dtype)
        return jnp.sum(straight_through(hard, soft))

    x = jnp.array([0.3, -0.2])
    val = f(x)
    g = jax.grad(f)(x)
    # forward value is hard
    assert float(val) == 1.0
    # gradient is the soft sigmoid's
    expected = jax.nn.sigmoid(x) * (1 - jax.nn.sigmoid(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-6)


def test_fused_diff_wrappers_match_autodiff():
    """Closed-form custom VJPs of the fused samplers == autodiff of the
    pure-JAX samplers (identical forward on the CPU fallback path)."""
    from topo_audio_autoencoder_tpu.ops import (
        binary_gumbel_fused_diff,
        hard_concrete_fused_diff,
    )

    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-2.0, 2.0, 64)
    g1 = jax.grad(lambda l: (binary_gumbel_fused_diff(l, key, 0.7, True) ** 2).sum())(x)
    g2 = jax.grad(lambda l: (binary_gumbel(l, key, 0.7, True) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    h1 = jax.grad(lambda l: (hard_concrete_fused_diff(l, key, 0.7, True) ** 2).sum())(x)
    h2 = jax.grad(lambda l: (hard_concrete(l, key, 0.7, training=True) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_gumbel_gradients_finite():
    key = jax.random.PRNGKey(4)

    def loss(l):
        return jnp.sum(binary_gumbel(l, key, 0.5, training=True) ** 2)

    g = jax.grad(loss)(jnp.linspace(-3, 3, 64))
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------- fused attention


def _attn_shapes(rng, b=3, q=37, m=157, c=32):
    qx = jnp.asarray(rng.standard_normal((b, q, c)), jnp.float32)
    kx = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
    vx = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
    mask = (rng.random((b, m)) > 0.3).astype(np.float32)
    mask[1] = 0.0  # one fully-masked sample: output must be exactly zero
    return qx, kx, vx, jnp.asarray(mask)


def test_fused_attention_matches_reference(rng):
    from topo_audio_autoencoder_tpu.ops.attention import (
        _attn_fwd_call,
        _fused_fwd,
        _reference_attention,
        _round_up,
        _split_heads,
        fused_masked_attention,
    )

    qx, kx, vx, mask = _attn_shapes(rng)
    h = 4
    ref = _reference_attention(qx, kx, vx, mask, h)

    # CPU dispatch goes through the jnp path — identity by construction;
    # run the Pallas kernel in interpreter mode to check the kernel math.
    b, q, c = qx.shape
    m = kx.shape[1]
    qp, mp = _round_up(q, 128), _round_up(m, 128)
    qh = jnp.pad(_split_heads(qx, h), ((0, 0), (0, qp - q), (0, 0)))
    kth = jnp.pad(
        jnp.swapaxes(_split_heads(kx, h), 1, 2), ((0, 0), (0, 0), (0, mp - m))
    )
    vth = jnp.pad(
        jnp.swapaxes(_split_heads(vx, h), 1, 2), ((0, 0), (0, 0), (0, mp - m))
    )
    maskp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, mp - m)))[:, None, :]
    out, p = _attn_fwd_call(qh, kth, vth, maskp, interpret=True)

    from topo_audio_autoencoder_tpu.ops.attention import _merge_heads

    got = _merge_heads(out[:, :q], b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # fully-masked sample: exact zeros (output and weights)
    assert np.all(np.asarray(got[1]) == 0.0)
    ph = np.asarray(p).reshape(b, h, qp, mp)
    assert np.all(ph[1] == 0.0)
    # weights are a softmax: rows of valid samples sum to 1
    np.testing.assert_allclose(
        ph[0, :, :q, :].sum(-1), np.ones((h, q)), atol=2e-2
    )


def test_fused_attention_gradients_match_reference(rng):
    from topo_audio_autoencoder_tpu.ops.attention import (
        _reference_attention,
        fused_masked_attention,
    )

    qx, kx, vx, mask = _attn_shapes(rng, b=2, q=13, m=29, c=16)
    h = 4

    def loss_fused(q, k, v):
        return (fused_masked_attention(q, k, v, mask, h) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, mask, h) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qx, kx, vx)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qx, kx, vx)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fused_attention_bwd_formula_matches_autodiff(rng):
    """The hand-written XLA backward (used on TPU with the saved weights)
    must equal autodiff of the reference math. Exercised by faking the
    TPU residual path: call _fused_bwd with a p computed by the kernel."""
    from topo_audio_autoencoder_tpu.ops.attention import (
        _attn_fwd_call,
        _fused_bwd,
        _reference_attention,
        _round_up,
        _split_heads,
    )

    qx, kx, vx, mask = _attn_shapes(rng, b=2, q=150, m=29, c=16)
    h = 4
    b, q, c = qx.shape
    m = kx.shape[1]
    qp, mp = _round_up(q, 128), _round_up(m, 128)
    qh = jnp.pad(_split_heads(qx, h), ((0, 0), (0, qp - q), (0, 0)))
    kth = jnp.pad(
        jnp.swapaxes(_split_heads(kx, h), 1, 2), ((0, 0), (0, 0), (0, mp - m))
    )
    vth = jnp.pad(
        jnp.swapaxes(_split_heads(vx, h), 1, 2), ((0, 0), (0, 0), (0, mp - m))
    )
    maskp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, mp - m)))[:, None, :]
    out, p = _attn_fwd_call(qh, kth, vth, maskp, interpret=True)

    ct = jnp.asarray(rng.standard_normal((b, q, c)), jnp.float32)
    dq, dk, dv, dm = _fused_bwd(h, (qx, kx, vx, mask, p), ct)
    assert dm is None

    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, mask, h),
        qx, kx, vx,
    )
    rq, rk, rv = vjp(ct)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4)


# ---------------------------------------------------------------- sccn combine


def _combine_inputs(rng, m=3, b=2, s=37, c=16):
    car = jnp.asarray(rng.standard_normal((m, b, s, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((m, c, c)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, c)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, 1)) * 0.3, jnp.float32)
    return car, x, v, w1, b1, w2


@pytest.mark.parametrize("m", [1, 2, 3])
def test_message_combine_kernel_matches_reference(rng, m):
    """Interpret-mode Pallas forward == jnp reference (incl. row padding)."""
    from topo_audio_autoencoder_tpu.ops.sccn_combine import (
        _flatten_pad,
        _fwd_call,
        message_combine_reference,
    )

    car, x, v, w1, b1, w2 = _combine_inputs(rng, m=m)
    ref = message_combine_reference(car, x, v, w1, b1, w2)
    mm, b, s, c = car.shape
    car2, x2 = _flatten_pad(car, x)
    y = _fwd_call(car2, x2, v, w1, b1, w2, interpret=True)
    got = y[: b * s].reshape(b, s, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m", [1, 3])
def test_message_combine_bwd_matches_autodiff(rng, m):
    """Interpret-mode Pallas backward == autodiff of the jnp reference."""
    from topo_audio_autoencoder_tpu.ops.sccn_combine import (
        _bwd_call,
        _flatten_pad,
        message_combine_reference,
    )

    car, x, v, w1, b1, w2 = _combine_inputs(rng, m=m)
    mm, b, s, c = car.shape
    dy = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)

    _, vjp = jax.vjp(message_combine_reference, car, x, v, w1, b1, w2)
    refs = vjp(dy)

    car2, x2 = _flatten_pad(car, x)
    dy2 = jnp.pad(dy.reshape(b * s, c), ((0, car2.shape[1] - b * s), (0, 0)))
    dcar, dx, dv, dw1, db1, dw2 = _bwd_call(
        car2, x2, v, w1, b1, w2, dy2, interpret=True
    )
    got = (
        dcar[:, : b * s].reshape(mm, b, s, c),
        dx[: b * s].reshape(b, s, c),
        dv,
        dw1,
        db1.reshape(c),
        dw2.reshape(c, 1),
    )
    for g, r, name in zip(got, refs, ["dcar", "dx", "dv", "dw1", "db1", "dw2"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_packed_combine_parity_interpret():
    """The experimental lane-packed M=2 combine kernels
    (benchmarks/kernel_diag.py) match the jnp reference — forward and all
    six cotangents — in interpret mode. Keeps the candidate honest while
    it awaits its on-chip A/B."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "_kernel_diag_under_test",
        Path(__file__).resolve().parent.parent / "benchmarks" / "kernel_diag.py",
    )
    kd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kd)

    car, x, v, w1, b1, w2 = kd.make_inputs(256, 2, 64, jnp.float32, seed=3)
    ref = kd.message_combine_reference(car, x, v, w1, b1, w2)
    got = kd.packed_call(car, x, v, w1, b1, w2, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    pc = kd.make_packed_combine(tile=128, interpret=True)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    g_ref = jax.grad(loss(kd.message_combine_reference), argnums=(0, 1, 2, 3, 4, 5))(
        car, x, v, w1, b1, w2)
    g_pk = jax.grad(loss(pc), argnums=(0, 1, 2, 3, 4, 5))(car, x, v, w1, b1, w2)
    for name, a, b in zip(("dcar", "dx", "dv", "dw1", "db1", "dw2"), g_ref, g_pk):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=name)


# NOTE: the learned-stretch kernel itself (on-chip PRNG) cannot run in
# interpret mode on this jax version (prng_seed has no CPU lowering, like
# the fixed sampler kernels); its on-chip parity against the fixed kernel
# at default stretch is probed on TPU by benchmarks/probe_learned_kernel.py.


def test_learned_hc_fused_diff_matches_autodiff_on_fallback():
    """On CPU the learned fused sampler falls back to the pure-JAX
    hard_concrete, so the custom closed-form VJP must equal autodiff of
    that same primal — including the stretch-parameter cotangents."""
    import jax
    import jax.numpy as jnp
    from topo_audio_autoencoder_tpu.ops import pallas_kernels as pk
    from topo_audio_autoencoder_tpu.ops import samplers

    rng = np.random.default_rng(1)
    la = jnp.asarray(rng.standard_normal((3, 40)), jnp.float32)
    beta = jnp.asarray(0.4 + 0.5 * rng.random(40), jnp.float32)
    gamma = jnp.asarray(-0.2 * rng.random(40) - 0.01, jnp.float32)
    zeta = jnp.asarray(1.0 + 0.3 * rng.random(40) + 0.01, jnp.float32)
    key = jax.random.PRNGKey(5)
    ct = jnp.asarray(rng.standard_normal((3, 40)), jnp.float32)

    def ref(la, beta, gamma, zeta):
        z = samplers.hard_concrete(
            la, key, beta,
            samplers.HardConcreteParams(gamma=gamma, zeta=zeta), True,
        )
        return (z * ct).sum()

    def fused(la, beta, gamma, zeta):
        z = pk.hard_concrete_fused_learned_diff(
            la, key, beta, gamma, zeta, True
        )
        return (z * ct).sum()

    # identical primal (same fallback), so gradients must agree
    np.testing.assert_allclose(
        float(ref(la, beta, gamma, zeta)), float(fused(la, beta, gamma, zeta)),
        rtol=1e-6,
    )
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 3))(la, beta, gamma, zeta)
    g_fused = jax.grad(fused, argnums=(0, 1, 2, 3))(la, beta, gamma, zeta)
    for a, b, name in zip(g_ref, g_fused, ("la", "beta", "gamma", "zeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )
