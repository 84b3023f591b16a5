"""Planning-time benchmark for the columnar _STATS sidecar: write,
load, and vectorized-prune a synthetic N-entry (default 100k) sidecar,
against the per-entry Python-loop equivalent. Driver-side only — no
Spark session. Prints one JSON line."""

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a2b_spark.storage import stats as S  # noqa: E402


def synth(n: int) -> dict:
    rnd = random.Random(7)
    files = {}
    for i in range(n):
        lo = rnd.randrange(0, 10_000_000)
        hi = lo + rnd.randrange(1, 10_000)
        files[f"part-{i:06d}.parquet"] = {
            "rows": 10_000,
            "cols": {
                "x": {"t": "i", "min": lo, "max": hi, "nulls": 0},
                "name": {
                    "t": "s",
                    "min": f"a{lo:09d}",
                    "max": f"a{hi:09d}",
                    "nulls": 0,
                },
            },
        }
    return {"version": S.STATS_FORMAT_VERSION, "files": files}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    stats = synth(n)
    preds = S.normalize_predicates([("x", "between", (5_000_000, 5_010_000))])
    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        S.write_stats(d, stats)
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        tbl = S.load_stats_arrow(d)
        t_load = time.perf_counter() - t0
        all_files = list(stats["files"])
        t0 = time.perf_counter()
        kept_vec = S.keep_files(tbl, all_files, preds)
        t_prune = time.perf_counter() - t0
        t0 = time.perf_counter()
        kept_loop = [
            r for r, e in stats["files"].items() if S.file_may_match(e, preds)
        ]
        t_loop = time.perf_counter() - t0
        assert set(kept_vec) == set(kept_loop)
        print(
            json.dumps(
                {
                    "entries": n,
                    "sidecar_bytes": os.path.getsize(
                        os.path.join(d, S.STATS_FILE)
                    ),
                    "write_s": round(t_write, 3),
                    "load_s": round(t_load, 3),
                    "prune_s": round(t_prune, 3),
                    "kept": len(kept_loop),
                    "python_loop_equivalent_s": round(t_loop, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
