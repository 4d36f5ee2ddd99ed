"""Generate blue-noise masks via void-and-cluster (Ulichney 1993).

The reference ships Eric Heitz's precomputed sobol/scrambling/ranking
textures as binary assets (blue_noise.cpp:5-19) which are NOT in the repo;
this tool regenerates equivalent-purpose blue-noise rank masks offline and
stores them as a small .npy committed to the repo (loaded by
hybrid_rendering_tpu/ops/bluenoise.py).

Run: python tools/gen_blue_noise.py
"""
import os

import numpy as np


def _gaussian_energy(binary: np.ndarray, sigma: float = 1.9) -> np.ndarray:
    """Toroidal gaussian filter via FFT."""
    n = binary.shape[0]
    x = np.arange(n)
    x = np.minimum(x, n - x).astype(np.float64)
    g1 = np.exp(-(x**2) / (2 * sigma * sigma))
    kernel = np.outer(g1, g1)
    return np.real(
        np.fft.ifft2(np.fft.fft2(binary) * np.fft.fft2(kernel))
    )


def void_and_cluster(n: int = 128, seed: int = 0) -> np.ndarray:
    """Returns an (n, n) rank array in [0, n*n)."""
    rs = np.random.RandomState(seed)
    total = n * n
    # initial pattern: 10% random points relaxed to the tightest-cluster rule
    binary = np.zeros((n, n), bool)
    init = total // 10
    idx = rs.choice(total, init, replace=False)
    binary.flat[idx] = True
    for _ in range(4 * init):
        e = _gaussian_energy(binary)
        cluster = np.unravel_index(np.argmax(np.where(binary, e, -np.inf)), e.shape)
        binary[cluster] = False
        e = _gaussian_energy(binary)
        void = np.unravel_index(np.argmin(np.where(binary, np.inf, e)), e.shape)
        if void == cluster:
            binary[cluster] = True
            break
        binary[void] = True

    rank = np.zeros((n, n), np.int32)
    # phase 1: remove tightest cluster one by one
    b = binary.copy()
    for r in range(init - 1, -1, -1):
        e = _gaussian_energy(b)
        c = np.unravel_index(np.argmax(np.where(b, e, -np.inf)), e.shape)
        b[c] = False
        rank[c] = r
    # phase 2: fill largest void
    b = binary.copy()
    for r in range(init, total):
        e = _gaussian_energy(b)
        v = np.unravel_index(np.argmin(np.where(b, np.inf, e)), e.shape)
        b[v] = True
        rank[v] = r
    return rank


def main():
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "hybrid_rendering_tpu", "data"
    )
    os.makedirs(out_dir, exist_ok=True)
    n = 128
    masks = []
    for seed in range(2):  # two independent masks -> 2D sample vectors
        print(f"generating {n}x{n} mask, seed {seed}...")
        rank = void_and_cluster(n, seed)
        masks.append((rank.astype(np.float32) + 0.5) / (n * n))
    arr = np.stack(masks, axis=-1)  # (n, n, 2) in (0,1)
    path = os.path.join(out_dir, "blue_noise_128.npy")
    np.save(path, arr.astype(np.float32))
    print("saved", path, arr.shape)


if __name__ == "__main__":
    main()
