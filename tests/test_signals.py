"""Signal generator tests (mirrors reference test/test_signals.jl:
determinism and analytic correctness)."""

import numpy as np
import pytest

from qilaplace_tpu import generate_signal


def test_sin_analytic():
    n, freq = 6, 3.0
    x = np.asarray(generate_signal(n, kind="sin", freq=freq, dtype=np.float64))
    dt = 1.0 / (freq * 2**n)
    j = np.arange(2**n)
    assert np.allclose(x, np.sin(freq * dt * j), atol=1e-12)


def test_sin_vector_freq_and_phase():
    n = 5
    freqs = [1.0, 2.5]
    phases = [0.1, 0.2]
    x = np.asarray(
        generate_signal(n, kind="sin", freq=freqs, phase=phases, dtype=np.float64)
    )
    dt = 1.0 / (2.5 * 2**n)
    j = np.arange(2**n)
    expected = sum(np.sin(w * dt * j + p) for w, p in zip(freqs, phases))
    assert np.allclose(x, expected, atol=1e-12)


def test_sin_decay():
    n = 5
    x = np.asarray(
        generate_signal(
            n, kind="sin_decay", freq=2.0, decay_rate=0.5, dtype=np.float64
        )
    )
    dt = 1.0 / (2.0 * 2**n)
    j = np.arange(2**n)
    expected = np.sin(2.0 * dt * j) * np.exp(-0.5 * dt * j)
    assert np.allclose(x, expected, atol=1e-12)


def test_abs_cos_power():
    n = 4
    x = np.asarray(generate_signal(n, kind="abs_cos_power_p8", dt=0.01,
                                   dtype=np.float64))
    j = np.arange(2**n)
    assert np.allclose(x, np.abs(np.cos(2 * np.pi * 0.01 * j)) ** 0.8)


def test_random_deterministic():
    a = np.asarray(generate_signal(6, kind="random", seed=42))
    b = np.asarray(generate_signal(6, kind="random", seed=42))
    c = np.asarray(generate_signal(6, kind="random", seed=43))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (64,)


def test_multi_sin_deterministic_and_shape():
    for kind in ("multi_sin", "multi_sin_exp"):
        a = np.asarray(generate_signal(7, kind=kind))
        b = np.asarray(generate_signal(7, kind=kind))
        assert np.array_equal(a, b)
        assert a.shape == (128,)
        assert np.abs(a).max() > 0


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        generate_signal(4, kind="nope")


def test_vector_freq_length_mismatch():
    with pytest.raises(ValueError):
        generate_signal(4, kind="sin_decay", freq=[1.0, 2.0], decay_rate=[1.0])


def test_sin_phase_none_vector_freq():
    # regression: phase=None with a frequency vector must mean zero phases
    # (previously crashed in np.asarray(None) before the default handling)
    n = 5
    freqs = [1.0, 2.0]
    x = np.asarray(
        generate_signal(n, kind="sin", freq=freqs, phase=None, dtype=np.float64)
    )
    dt = 1.0 / (2.0 * 2**n)
    j = np.arange(2**n)
    expected = sum(np.sin(w * dt * j) for w in freqs)
    assert np.allclose(x, expected, atol=1e-12)


def test_sin_scalar_phase_vector_freq():
    n = 5
    freqs = [1.0, 2.0]
    x = np.asarray(
        generate_signal(n, kind="sin", freq=freqs, phase=0.3, dtype=np.float64)
    )
    dt = 1.0 / (2.0 * 2**n)
    j = np.arange(2**n)
    expected = sum(np.sin(w * dt * j + 0.3) for w in freqs)
    assert np.allclose(x, expected, atol=1e-12)
