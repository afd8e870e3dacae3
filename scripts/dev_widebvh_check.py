"""Dev check: wide-BVH packet traversal vs brute force (CPU interpret)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("FORCE_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np
import jax
import jax.numpy as jnp


def random_mesh(n_tris, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.rand(n_tris, 3).astype(np.float32) * 4 - 2
    a = (rng.rand(n_tris, 3).astype(np.float32) - 0.5) * 0.3
    b = (rng.rand(n_tris, 3).astype(np.float32) - 0.5) * 0.3
    return c, a, b  # v0=c, e1=a, e2=b


def main():
    from pbrt_tpu.accel.intersect import SceneGeom, t_pass_brute
    from pbrt_tpu.accel.bvh import build_bvh
    from pbrt_tpu.accel.wide_bvh import build_wide_bvh
    from pbrt_tpu.ops.bvh_pallas import wide_t_pass
    from pbrt_tpu.core.geometry import Ray

    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)

    nt = int(os.environ.get("NT", 3000))
    v0, e1, e2 = random_mesh(nt)
    T = nt
    geom = SceneGeom(
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n=jnp.zeros((T, 3, 3)), tri_has_n=jnp.zeros(T, bool),
        tri_uv=jnp.zeros((T, 3, 2)), tri_mat=jnp.zeros(T, jnp.int32),
        tri_light=jnp.full(T, -1, jnp.int32),
        quad_type=jnp.zeros((0,), jnp.int32), quad_o2w=jnp.zeros((0, 4, 4)),
        quad_w2o=jnp.zeros((0, 4, 4)), quad_params=jnp.zeros((0, 8)),
        quad_mat=jnp.zeros((0,), jnp.int32), quad_light=jnp.zeros((0,), jnp.int32),
        quad_flip=jnp.zeros((0,), bool),
        world_lo=jnp.asarray([-3.0, -3, -3]), world_hi=jnp.asarray([3.0, 3, 3]),
    )
    bvh = build_bvh(geom, "sah")
    wb = build_wide_bvh(bvh, geom)
    print("narrow nodes:", bvh.n_nodes, "blocks:", wb.n_blocks)

    rng = np.random.RandomState(1)
    R = int(os.environ.get("NR", 2048))
    o = (rng.rand(R, 3).astype(np.float32) * 8 - 4)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmin = np.zeros(R, np.float32)
    tmax = np.full(R, np.inf, np.float32)

    t_w, p_w = wide_t_pass(wb, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(tmin), jnp.asarray(tmax),
                           interpret=interpret)
    ray = Ray(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
              jnp.asarray(tmax), jnp.zeros(R))
    t_b, p_b = t_pass_brute(geom, ray)

    t_w, p_w, t_b, p_b = map(np.asarray, (t_w, p_w, t_b, p_b))
    hit_w, hit_b = p_w >= 0, p_b >= 0
    mism_hit = (hit_w != hit_b).sum()
    both = hit_w & hit_b
    dt = np.abs(t_w[both] - t_b[both])
    bad_t = (dt > 1e-3 * np.maximum(1.0, np.abs(t_b[both]))).sum()
    print(f"rays {R}: hit {hit_b.sum()} (brute) vs {hit_w.sum()} (wide); "
          f"hit mismatches {mism_hit}, t mismatches {bad_t}, "
          f"max|dt| {dt.max() if len(dt) else 0:.2e}")
    prim_mism = (p_w[both] != p_b[both]) & (dt > 1e-5)
    print("prim mismatches (excluding t-ties):", prim_mism.sum())
    assert mism_hit == 0 and bad_t == 0
    print("OK")


if __name__ == "__main__":
    main()
