#!/usr/bin/env python
"""FULL-pipeline scaling evidence: the spark-submit --py-files launcher
(extract -> dedup -> canonicalize, checkpointed) run end-to-end at
local[8] (with the other 24 cores carrying the identical-kernel
background load — the fair control from bench_scaling) and at
local[32], on the same synthesized input. Complements the
extraction-stage measurement in BENCH/BASELINE.md: this one exercises
the actual cluster launch line plus every stage boundary and checkpoint
write, and asserts the two runs produce identical canonical triples
(cross-parallelism determinism).

Usage: python scripts/pipeline_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from bench_scaling import BackgroundLoad  # noqa: E402


def run(master: str, shuffle: int, workdir: str, n_pages: int) -> dict:
    shutil.rmtree(workdir, ignore_errors=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_SHUFFLE_PARTITIONS=str(shuffle),
    )
    t0 = time.time()
    out = subprocess.run(
        [
            os.path.join(REPO, "scripts", "spark_submit_demo.sh"),
            "--pages",
            str(n_pages),
            "--workdir",
            workdir,
        ],
        env=env,
        capture_output=True,
        text=True,
        # 1M-page legs: the loaded local[8] run is ~20 min end-to-end
        # (graph stage dominates); 1800 s killed it mid-stage
        timeout=3600,
        cwd=REPO,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("PIPELINE_RESULT")
    ]
    if not lines:
        raise RuntimeError(f"no PIPELINE_RESULT at {master}: {out.stderr[-800:]}")
    rec = json.loads(lines[-1][len("PIPELINE_RESULT "):])
    rec["launcher_wall_sec"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    with BackgroundLoad(24):
        r8 = run("local[8]", 8, "/tmp/nlq_pscale8", n_pages)
    r32 = run("local[32]", 32, "/tmp/nlq_pscale32", n_pages)
    assert r8["canonical_triples"] == r32["canonical_triples"], (
        "pipeline output must be identical at both parallelism levels"
    )
    assert r8.get("canonical_hash") == r32.get("canonical_hash"), (
        "pipeline CONTENT must be identical at both parallelism levels "
        "(order-insensitive xxhash64 sum over all columns)"
    )
    eff = (r8["wall_sec"] / r32["wall_sec"]) / 4
    print(
        json.dumps(
            {
                "mode": "pipeline-fair-loaded-control",
                "n_pages": n_pages,
                "canonical_triples": r8["canonical_triples"],
                "local8_loaded": r8,
                "local32": r32,
                "pipeline_fair_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
