"""Dense oracles shared across tests (mirrors reference test/preamble_test.jl
and the analytic references in test_qft/dt/zt_transformer.jl)."""

import numpy as np

from qilaplace_tpu.utils.bits import bit_reverse


def dft_matrix(n: int) -> np.ndarray:
    """Unitary DFT with the -2*pi*i convention
    (reference test/test_qft_transformer.jl:6-19)."""
    N = 2**n
    j, k = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    return np.exp(-2j * np.pi * j * k / N) / np.sqrt(N)


def qn_matrix(n: int) -> np.ndarray:
    """Bit-reversed DFT Q_n[j, k] = e^{-2*pi*i*bitrev(j)*k/N}/sqrt(N)
    (reference test/test_qft_transformer.jl:23-33)."""
    N = 2**n
    M = np.zeros((N, N), dtype=complex)
    for j in range(N):
        jr = bit_reverse(j, n)
        for k in range(N):
            M[j, k] = np.exp(-2j * np.pi * jr * k / N) / np.sqrt(N)
    return M


def analytical_dt(vec, wr: float) -> np.ndarray:
    """DT|j> = (1/sqrt N) sum_k e^{-wr k j / N} |k>
    (reference test/test_dt_transformer.jl:60-91)."""
    vec = np.asarray(vec)
    N = len(vec)
    k, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    kernel = np.exp(-wr * k * j / N) / np.sqrt(N)
    return kernel @ vec.astype(complex)


def analytical_zt(x, wr: float, wi: float = 2 * np.pi) -> np.ndarray:
    """chi[k, l] = (1/N) sum_j x_j e^{-(wr k + i wi l) j / N}
    (reference test/test_zt_transformer.jl:12-40)."""
    x = np.asarray(x, dtype=complex)
    N = len(x)
    Z = np.zeros((N, N), dtype=complex)
    for k in range(N):
        for l in range(N):
            s = (wr * k + 1j * wi * l) / N
            Z[k, l] = np.sum(x * np.exp(-s * np.arange(N))) / N
    return Z


def paired_vector_to_grid(vec2n: np.ndarray, n: int) -> np.ndarray:
    """Reshape a dense 4^n paired-register vector (interleaved chain, natural
    MSB-first chain order) into the (k, l) grid with LSB-first register bits
    (reference test extract_zt_output, test/test_zt_transformer.jl:50-63)."""
    N = 2**n
    arr = vec2n.reshape((2,) * (2 * n))
    Z = np.zeros((N, N), dtype=complex)
    for k in range(N):
        kb = [(k >> i) & 1 for i in range(n)]  # LSB-first
        for l in range(N):
            lb = [(l >> i) & 1 for i in range(n)]
            idx = []
            for i in range(n):
                idx.append(kb[i])
                idx.append(lb[i])
            Z[k, l] = arr[tuple(idx)]
    return Z


def basis_state(j: int, n: int) -> np.ndarray:
    v = np.zeros(2**n)
    v[j] = 1.0
    return v
