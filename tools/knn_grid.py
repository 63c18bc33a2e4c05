"""knn_graph tuning grid on the clustered-manifold fixture (VERDICT r9 #5).

RECALL.md's manifold section has only the default (k=3, probe=1) point; a
user tuning SemDeDup wants the planted-pair recall surface over k and the
multi-probe Hamming radius.  Prints the markdown table appended to
RECALL.md.

Usage: python tools/knn_grid.py [adv_dir]   (default /tmp/sf1adv)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from gen_scale import PLANT_COSINES, planted_pairs  # noqa: E402

from airstrik_py_spark.operators import similarity as SIM  # noqa: E402
from airstrik_py_spark.session import get_spark, pin_session  # noqa: E402
from airstrik_py_spark.sources.tables import load_table  # noqa: E402

KS = (3, 10, 25)
PROBES = (1, 2)


def main() -> None:
    adv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1adv"
    spark = get_spark("knn-grid")
    pin_session(spark)
    emb = load_table(spark, adv, "embeddings").cache()
    n = emb.count()
    plants = planted_pairs(n)
    tiers = {c: [(a, b) for a, b, cc in plants if cc == c] for c in PLANT_COSINES}

    print(f"# knn_graph grid on {adv} ({n} vecs, {len(plants)} planted pairs)")
    print()
    header = " | ".join(f"cos {c}" for c in PLANT_COSINES)
    print(f"| k | probe | edges | secs | {header} |")
    print("|---|---|---|---|" + "---|" * len(PLANT_COSINES))
    for k in KS:
        for probe in PROBES:
            t0 = time.monotonic()
            g = SIM.knn_graph(emb, k=k, probe_hamming=probe)
            edges = {
                (r["src_id"], r["dst_id"])
                for r in g.select("src_id", "dst_id").collect()
            }
            secs = time.monotonic() - t0
            cells = []
            for c in PLANT_COSINES:
                tier = tiers[c]
                hit = sum(
                    1 for a, b in tier if (a, b) in edges or (b, a) in edges
                )
                cells.append(f"{hit / max(len(tier), 1):.3f}")
            print(
                f"| {k} | {probe} | {len(edges)} | {secs:.1f} | "
                + " | ".join(cells)
                + " |"
            )


if __name__ == "__main__":
    main()
