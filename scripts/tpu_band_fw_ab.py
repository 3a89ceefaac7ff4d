"""Band v1 (masked [C,2C] body) vs frame-exact (fw) body A/B.

Per-layer attention fwd+bwd at the shipped geometries with the shared
chained-scan harness (scripts/chain_harness.py — the three axon-relay
gotchas). The fw bodies compute per-query-frame exact windows — no
visibility masks, no 2C logit width — at the cost of sublane-misaligned
VMEM slices for ragged tpf (ops/band._fwd_kernel_fw). This A/B decides
the OWL_BAND_FW auto policy.

Usage: python scripts/tpu_band_fw_ab.py [geometry ...]
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from chain_harness import make_stepper, bench, qkv_inputs
from owl_audio_exps_tpu.ops.band import band_attention

GEOS = {
    # name: (L, tpf, window, H, Dh, head_chunks)
    "av384": (24960, 65, 8, 24, 64, 1),
    "av384w16": (24960, 65, 16, 24, 64, 1),   # the step bench's window
    "av512": (33280, 65, 8, 24, 64, 1),
    "av640": (41600, 65, 8, 24, 64, 1),
    "dit16k": (16384, 64, 16, 24, 64, 1),
    "dit65k": (65536, 64, 16, 24, 64, 4),
    "dit98k": (98304, 64, 16, 24, 64, 4),
}

BOUND = 64.0 ** 0.5


def run(name):
    L, tpf, win, H, Dh, hc = GEOS[name]
    qs, k, v = qkv_inputs(L, H, Dh)

    for fwd_only in (True, False):
        tag = "fwd    " if fwd_only else "fwd+bwd"
        res, err = {}, {}
        for fe in (False, True):
            f = make_stepper(
                lambda q, k, v, fe=fe: band_attention(
                    q, k, v, tpf, win, head_chunks=hc,
                    logit_bound=BOUND, frame_exact=fe),
                fwd_only=fwd_only)
            try:
                res[fe] = bench(f, qs, k, v)
            except Exception as ex:
                err[fe] = f"{type(ex).__name__}: {str(ex)[:100]}"
        if err:
            # a crashed variant must read as a FAILURE, not a speedup
            for fe in (False, True):
                label = "fw" if fe else "v1"
                msg = err.get(fe) or f"{res[fe]*1e3:8.2f} ms"
                print(f"{name} {tag} {label}: {msg}")
            continue
        d = (1 - res[True] / res[False]) * 100
        print(f"{name} {tag}: v1 {res[False]*1e3:8.2f} ms  "
              f"fw {res[True]*1e3:8.2f} ms  ({d:+.1f}%)")


if __name__ == "__main__":
    names = sys.argv[1:] or ["av384", "av512", "dit16k"]
    for n in names:
        run(n)
