"""How much does the scatter1 z-buffer change WHICH point wins?

The scatter1 raster (ops/rasterize._zbuffer_scatter1) quantizes depth to
``31 - ceil(log2(N))`` bits and breaks ties *within one bin* by id; the
sort raster orders by exact depth. This probe measures, at the bench.py
operating point (1M uniform points, 368x1216, 4-scale pooled pyramid),
the fraction of non-empty pixels whose winning point index differs —
the upper bound on quality impact (a differing winner still sits within
2^-11 of the same NDC depth, i.e. it is a near-coincident point).

Run on TPU or CPU; prints one line per pyramid level + a summary.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from read_tpu.ops import rasterize as R
    from read_tpu.scene import camera

    rng = np.random.default_rng(0)
    n, h, w = 1_000_000, 368, 1216
    xyz = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    xyz[:, 2] -= 25.0
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]])
    P = camera.gl_projection(K, (w, h), znear=0.1, zfar=1000.0)
    m = camera.total_matrix(P, np.eye(4)).astype(np.float32)[None]

    xyz_j, m_j = jnp.asarray(xyz), jnp.asarray(m)
    out = {}
    for method in ("sort", "scatter1"):
        out[method] = [
            (np.asarray(ix), np.asarray(dep))
            for ix, dep in R.rasterize_pyramid_pooled(
                xyz_j, m_j, (h, w), 4, method=method)]
    tot_diff = tot_pix = 0
    for lvl, ((i_s, d_s), (i_q, d_q)) in enumerate(
            zip(out["sort"], out["scatter1"])):
        filled = i_s >= 0
        assert (filled == (i_q >= 0)).all(), "occupancy must match"
        diff = (i_s != i_q) & filled
        nd, npix = int(diff.sum()), int(filled.sum())
        tot_diff += nd
        tot_pix += npix
        # depth gap between the two winners at differing pixels
        gap = np.abs(d_s[diff] - d_q[diff])
        print(f"level {lvl}: {nd}/{npix} pixels differ "
              f"({100.0 * nd / max(npix, 1):.4f}%), max |dz| "
              f"{gap.max() if nd else 0.0:.3e} of [0,1] NDC depth")
    print(f"TOTAL: {tot_diff}/{tot_pix} "
          f"({100.0 * tot_diff / max(tot_pix, 1):.4f}%)")


if __name__ == "__main__":
    main()
