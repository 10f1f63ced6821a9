"""pool1-backward, third form (VERDICT r4 #8): PARITY-PLANE decomposition.

The standing cost: resnet-50 pool1 (3x3/s2 on 112², b128) backward via
XLA SelectAndScatter = 2.34 ms — 56% of the stem's fwd+bwd floor. Two
scatter-free forms already lost (strided .at[].add 9.5 ms; gather-form
first-match 21.1 ms — its k² full-size elementwise passes over
STRIDE-DILATED 112² arrays out-cost the scatter).

This form removes the dilation: with s=2, k=3, each INPUT-pixel parity
class (py,px) receives contributions from a fixed set of taps
(ky≡py, kx≡px mod 2), so dx's four parity planes are sums of ≤4
UN-dilated 56² masked-cotangent terms (shifted by at most one output
pixel), interleaved at the end by a reshape — every intermediate is
56² (4x fewer elements than the gather form's dilated arrays), no
scatter, no interior padding. First-match argmax semantics (caffe
window order) via a cumulative-OR mask chain, recomputed from x.

Run on the TPU: python scripts/poolbwd_parity_probe.py
(on CPU it self-checks against jax's own S&S VJP first).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parity_pool_bwd(x, g, oy, ox):
    """dx for 3x3/s2 pad-0 max pool (caffe ceil geometry), NHWC.
    x: (n, h, w, c); g: (n, oy, ox, c). Returns (n, h, w, c)."""
    import jax.numpy as jnp
    n, h, w, c = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 2 * oy + 2 - h), (0, 2 * ox + 2 - w),
                     (0, 0)), constant_values=neg)
    v = {}
    for ky in range(3):
        for kx in range(3):
            v[(ky, kx)] = xp[:, ky:ky + 2 * oy - 1:2,
                             kx:kx + 2 * ox - 1:2, :]
    m = v[(0, 0)]
    for k in list(v)[1:]:
        m = jnp.maximum(m, v[k])
    # first-match (caffe window order): tap k wins iff it equals the max
    # and no earlier tap did
    taken = None
    cs = {}
    for ky in range(3):
        for kx in range(3):
            eq = v[(ky, kx)] == m
            win = eq if taken is None else jnp.logical_and(
                eq, jnp.logical_not(taken))
            taken = eq if taken is None else jnp.logical_or(taken, eq)
            cs[(ky, kx)] = jnp.where(win, g, 0)

    def sh(cv, dy, dx_):
        if not (dy or dx_):
            return cv
        return jnp.pad(cv, ((0, 0), (dy, 0), (dx_, 0), (0, 0)))[
            :, :oy, :ox, :]

    d = [[None, None], [None, None]]
    d[0][0] = cs[(0, 0)] + sh(cs[(2, 0)], 1, 0) + sh(cs[(0, 2)], 0, 1) \
        + sh(cs[(2, 2)], 1, 1)
    d[0][1] = cs[(0, 1)] + sh(cs[(2, 1)], 1, 0)
    d[1][0] = cs[(1, 0)] + sh(cs[(1, 2)], 0, 1)
    d[1][1] = cs[(1, 1)]
    row0 = jnp.stack([d[0][0], d[0][1]], axis=3)  # (n, oy, ox, px, c)
    row1 = jnp.stack([d[1][0], d[1][1]], axis=3)
    D = jnp.stack([row0, row1], axis=2)           # (n, oy, py, ox, px, c)
    dx = D.reshape(n, 2 * oy, 2 * ox, c)
    return dx[:, :h, :w, :]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.backend.xla import enable_compilation_cache
    from boda_tpu.tune.prof import _chained_secs

    enable_compilation_cache()

    def native(xv, oy, ox):  # jax's S&S path
        xp = jnp.pad(xv, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     constant_values=-jnp.inf)
        m = lax.reduce_window(xp, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "valid")
        return m[:, :oy, :ox, :]

    # correctness first (small, f32, continuous — no ties): parity form
    # == jax's S&S gradient
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 12, 12, 8), jnp.float32)
    gs = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    _, vjp = jax.vjp(lambda v: native(v, 6, 6), xs)
    want = np.asarray(vjp(gs)[0])
    got = np.asarray(parity_pool_bwd(xs, gs, 6, 6))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    print("correctness vs S&S gradient: OK", flush=True)

    # timing at the in-net shape
    n, c, h, o = 128, 64, 112, 56
    x = jnp.asarray(np.maximum(rng.randn(n, h, h, c) * 0.3, 0),
                    jnp.bfloat16)
    g = jnp.asarray(rng.randn(n, o, o, c) * 0.1, jnp.bfloat16)

    def f_ss(xv, gv):
        _, vjp = jax.vjp(lambda v: native(v, o, o), xv)
        return vjp(gv)[0].astype(jnp.float32).sum()

    def f_par(xv, gv):
        return parity_pool_bwd(xv, gv, o, o).astype(jnp.float32).sum()

    for name, f in [("pool1 bwd select-and-scatter", f_ss),
                    ("pool1 bwd PARITY-PLANE", f_par)]:
        secs = _chained_secs(f, [x, g], 16, reps=3)
        print(f"{name:32s} {secs * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
