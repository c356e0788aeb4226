#!/usr/bin/env python
"""Interleaved A/B of detect configs in ONE process (tunnel drift makes
separate runs incomparable).  Alternates configs A/B/A/B... and reports the
best rep per config.

Usage: python scripts/ab_batch.py [n_reads] [read_len] [rounds]
Config A: batch 16, fill cap 16 (current default)
Config B: batch 32, fill cap 32
"""

import os
import sys
import time

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.models import reference_cnn
from dnascent_tpu.pipeline.detect import detect_reads, DetectStats
from dnascent_tpu.pipeline.source import SimulatedSource


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = DNA_R10
    models = synthetic_model_set(cfg)
    model = reference_cnn.create_model()
    params = reference_cnn.params_from_tensors(
        reference_cnn.synthetic_tensors(0))
    records = list(SimulatedSource(models, cfg, n_reads=n_reads,
                                   length=read_len, seed=1234))

    import os as _os
    if _os.environ.get("AB_DEPTH"):
        configs = {
            "A(b16,f16,d6)": dict(batch=16, fill=16, depth=6),
            "B(b16,f16,d9)": dict(batch=16, fill=16, depth=9),
        }
    elif _os.environ.get("AB_PACK"):
        configs = {
            "A(pack=1)": dict(batch=16, fill=16, depth=6,
                              env={"DNASCENT_PACK_SIG": "1"}),
            "B(pack=0)": dict(batch=16, fill=16, depth=6,
                              env={"DNASCENT_PACK_SIG": "0"}),
        }
    elif _os.environ.get("AB_WGRAN"):
        configs = {
            "A(wgran=2048)": dict(batch=16, fill=16, depth=6,
                                  env={"DNASCENT_VIT_W_GRAN": "2048"}),
            "B(wgran=1024)": dict(batch=16, fill=16, depth=6,
                                  env={"DNASCENT_VIT_W_GRAN": "1024"}),
        }
    else:
        configs = {
            "A(b16,f16,d6)": dict(batch=16, fill=16, depth=6),
            "B(b32,f32,d4)": dict(batch=32, fill=32, depth=4),
        }

    def run(c):
        prev = os.environ.get("DNASCENT_MAX_FILL_B")
        os.environ["DNASCENT_MAX_FILL_B"] = str(c["fill"])
        prev_env = {k: os.environ.get(k) for k in c.get("env", {})}
        os.environ.update(c.get("env", {}))
        try:
            stats = DetectStats()
            t0 = time.perf_counter()
            for _ in detect_reads(records, models, model, params, cfg,
                                  batch_size=c["batch"], stats=stats,
                                  pipeline_depth=c["depth"]):
                pass
            return stats.processed / (time.perf_counter() - t0)
        finally:
            if prev is None:
                del os.environ["DNASCENT_MAX_FILL_B"]
            else:
                os.environ["DNASCENT_MAX_FILL_B"] = prev
            for k, v in prev_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    best = {k: 0.0 for k in configs}
    for k, c in configs.items():  # warmup/compile both
        print(f"warmup {k}: {run(c):.2f} reads/s", flush=True)
    for r in range(rounds):
        for k, c in configs.items():
            rps = run(c)
            best[k] = max(best[k], rps)
            print(f"round {r} {k}: {rps:.2f} reads/s", flush=True)
    for k in configs:
        print(f"BEST {k}: {best[k]:.2f} reads/s")


if __name__ == "__main__":
    main()
