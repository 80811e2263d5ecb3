"""Print the BENCH.md ANN-recall table: recall@10 of each ANN route on the
standard clustered corpus (mixture of Gaussians, n=2000, dim=32, 20
clusters, noise 0.15, seed 5 — ops/ann_eval.py).

Run from /root/repo: ``python benchmarks/ann_recall.py``
"""

import sys
import time

sys.path.insert(0, ".")

from odinson_spark.ops import ann_eval as ae
from odinson_spark.ops import similarity as sim
from odinson_spark.session import get_spark


def main():
    spark = get_spark(app_name="ann_recall", master="local[8]", shuffle_partitions=8)
    vecs = ae.clustered_corpus(n=2000, dim=32, n_clusters=20, seed=5)
    truth = ae.true_topk(vecs, k=10)
    df = ae.corpus_df(spark, vecs).cache()
    df.count()
    routes = {
        "ivf (random centroids, nlist=20, nprobe=4)": lambda: sim.ivf_ann_topk(
            df, k=10, dim=32, nlist=20, nprobe=4
        ),
        "ivf (trained centroids, nlist=20, nprobe=4)": lambda: sim.ivf_ann_topk(
            df, k=10, dim=32, nlist=20, nprobe=4, train=True
        ),
        "lsh (8 planes, no multi-probe)": lambda: sim.lsh_ann_topk(
            df, k=10, dim=32, n_planes=8, n_probes=0
        ),
        "lsh (8 planes, 8 probes)": lambda: sim.lsh_ann_topk(
            df, k=10, dim=32, n_planes=8
        ),
    }
    print("| route | recall@10 | sec |")
    print("|---|---|---|")
    for name, build in routes.items():
        t0 = time.time()
        r = ae.recall_at_k(build(), truth)
        print(f"| {name} | {r:.4f} | {time.time() - t0:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
