"""Tool dispatcher: python -m pbrt_tpu.tools <tool> [args...]

Tools (reference tools/ directory): exrdiff exravg exrtotiff tifftoexr
obj2pbrt ply2pbrt bsdftest samplepat.
"""
import sys


def samplepat(argv=None) -> int:
    """Generate a best-candidate (Poisson-ish dart throwing) sample
    table (reference tools/samplepat.cpp -> samplers/bestcandidate.out)."""
    import numpy as np

    argv = list(sys.argv[1:] if argv is None else argv)
    out = argv[0] if argv else "bestcandidate.npy"
    n = int(argv[1]) if len(argv) > 1 else 4096
    rng = np.random.RandomState(0)
    pts = [rng.rand(2)]
    for _ in range(n - 1):
        cand = rng.rand(256, 2)
        arr = np.asarray(pts)
        # toroidal distance to the existing set; keep the farthest candidate
        d = cand[:, None, :] - arr[None, :, :]
        d = np.abs(d)
        d = np.minimum(d, 1.0 - d)
        dist = np.sqrt((d ** 2).sum(-1)).min(1)
        pts.append(cand[np.argmax(dist)])
    np.save(out, np.asarray(pts, np.float32))
    print(f"samplepat: wrote {n} best-candidate samples to {out}")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python -m pbrt_tpu.tools "
              "<exrdiff|exravg|exrtotiff|tifftoexr|obj2pbrt|ply2pbrt|"
              "bsdftest|samplepat> [args...]", file=sys.stderr)
        return 1
    tool = sys.argv[1]
    args = sys.argv[2:]
    if tool in ("exrdiff", "exravg", "exrtotiff", "tifftoexr"):
        from pbrt_tpu.tools import exrtools

        return getattr(exrtools, tool)(args)
    if tool in ("obj2pbrt", "ply2pbrt"):
        from pbrt_tpu.tools import converters

        return getattr(converters, tool)(args)
    if tool == "bsdftest":
        from pbrt_tpu.tools.bsdftest import bsdftest

        return bsdftest(args)
    if tool == "samplepat":
        return samplepat(args)
    print(f"unknown tool {tool!r}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
