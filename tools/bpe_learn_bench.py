"""BPE learn-path bench (verdict r4 #1 done-gate): the engine path
(ONE corpus shuffle -> bounded word-frequency collect -> driver-side
incremental pair-count heap) must learn n_merges=1024+ on the sf0.1
corpus in seconds, vs ~2 Spark jobs + a localCheckpoint per merge for
the retired iterative loop (kept as the parity twin). Appends the
numbers to SCALING.md.

Env: BPE_SF_DIR (default /root/testdata/sf0.1), BPE_MERGES (1024),
BPE_ITER_MERGES (8 — the twin is timed at a small k and extrapolated,
running it at 1024 would take the very minutes this change removes).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("BPE_SF_DIR", "/root/testdata/sf0.1")
N_MERGES = int(os.environ.get("BPE_MERGES", "1024"))
ITER_MERGES = int(os.environ.get("BPE_ITER_MERGES", "8"))


def main() -> None:
    from diffdataflowmlpipelines_spark.functions.bpe import (
        learn_bpe_incremental,
        learn_bpe_spark_iterative,
        word_frequencies,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="bpe_learn_bench", shuffle_partitions=32)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    t0 = time.monotonic()
    wf_rows = word_frequencies(docs, "text").collect()
    t_collect = time.monotonic() - t0
    wf = {r["word"]: int(r["freq"]) for r in wf_rows}

    t0 = time.monotonic()
    merges = learn_bpe_incremental(wf, N_MERGES)
    t_learn = time.monotonic() - t0

    t0 = time.monotonic()
    it = learn_bpe_spark_iterative(docs, ITER_MERGES)
    n_iter = it.count()
    t_iter = time.monotonic() - t0
    per_merge = t_iter / max(n_iter, 1)

    # The sf corpus is synthetic with a tiny closed vocabulary (31
    # distinct words at sf0.1) — it EXHAUSTS at ~107 merges, so the
    # corpus-complete merge table is the honest per-corpus number. The
    # production-vocabulary claim (32k merges) is evidenced on a
    # deterministic large synthetic vocabulary instead.
    import random

    rng = random.Random(42)
    big_words: set[str] = set()
    n_vocab = int(os.environ.get("BPE_STRESS_VOCAB", "200000"))
    while len(big_words) < n_vocab:
        n = rng.randint(3, 12)
        big_words.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n)))
    big_wf = {w: max(1, int(1e6 / (i + 1))) for i, w in enumerate(sorted(big_words))}
    stress = {}
    for k in (1024, 4096, 32768):
        t0 = time.monotonic()
        got = learn_bpe_incremental(big_wf, k)
        stress[k] = {"merges": len(got), "s": round(time.monotonic() - t0, 2)}

    result = {
        "sf_dir": SF_DIR,
        "vocab_words": len(wf),
        "n_merges": len(merges),
        "stress_vocab_words": n_vocab,
        "stress": stress,
        "engine_path_s": {
            "wf_collect": round(t_collect, 2),
            "driver_learn": round(t_learn, 2),
            "total": round(t_collect + t_learn, 2),
        },
        "iterative_twin": {
            "n_merges": n_iter,
            "total_s": round(t_iter, 2),
            "s_per_merge": round(per_merge, 3),
            "extrapolated_s_at_n_merges": round(per_merge * len(merges), 1),
        },
        "speedup_at_n_merges": round(
            (per_merge * len(merges)) / max(t_collect + t_learn, 1e-9), 1
        ),
    }
    print(json.dumps(result))

    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write(
            f"\n## BPE learn: driver-side incremental heap vs per-merge "
            f"Spark loop (round 5)\n\n"
            f"Protocol: `tools/bpe_learn_bench.py` at `{SF_DIR}` — the "
            f"engine path is ONE corpus shuffle (word_frequencies, "
            f"{len(wf)} distinct words collected) + the incremental "
            f"pair-count-heap learner on the driver; the retired "
            f"per-merge loop (2 Spark jobs + localCheckpoint per merge) "
            f"is timed at k={n_iter} and extrapolated.\n\n"
            f"| path | merges | time |\n|---|---|---|\n"
            f"| engine (collect {t_collect:.1f}s + learn {t_learn:.1f}s) "
            f"| {len(merges)} | **{t_collect + t_learn:.1f} s** |\n"
            f"| iterative twin (measured) | {n_iter} | {t_iter:.1f} s "
            f"({per_merge:.2f} s/merge) |\n"
            f"| iterative twin (extrapolated) | {len(merges)} | "
            f"~{per_merge * len(merges):.0f} s |\n\n"
            f"Speedup at {len(merges)} merges: "
            f"**{result['speedup_at_n_merges']}×**; at a production "
            f"32k-merge vocabulary the per-merge loop would be "
            f"~{per_merge * 32768 / 60:.0f} min of scheduler overhead "
            f"alone, while the driver-side learner's cost grows only "
            f"with affected-word mass per merge.\n\n"
            f"The sf corpus has a CLOSED {len(wf)}-word vocabulary, so "
            f"its complete merge table is {len(merges)} merges — the "
            f"production-scale merge counts are evidenced on a "
            f"deterministic {n_vocab}-word Zipf vocabulary (seed 42) "
            f"with the same learner:\n\n"
            f"| merges requested | learned | driver-side time |\n"
            f"|---|---|---|\n"
            + "".join(
                f"| {k} | {v['merges']} | {v['s']} s |\n"
                for k, v in stress.items()
            )
            + f"\n32k merges over a 200k-word vocabulary in "
            f"{stress[32768]['s']} s driver-side — vs ~{per_merge * 32768 / 60:.0f} min "
            f"of job-scheduling overhead alone for the per-merge Spark "
            f"loop at the same count.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
