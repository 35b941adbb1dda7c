"""Data-level annotator-diversity (d_yy) report for the synthetic tasks.

VERDICT r3 #8: every cross-task GED^2 comparison needs the task's own
annotator diversity and the finite-sample estimator floor next to it, so
GED magnitudes are auditable at a glance and the bfield amplitude is
documented by measurement rather than a tuning comment.

For each task this measures, over the SAME deterministic test split the
eval CLIs use (SyntheticData seed=0 -> test seed=2, n=256, 128x128, 4
annotators) and the SAME distance the GED uses (pairwise_iou_distance,
label_range=(1,), nlabels divisor 1 -- engine/validation.py:62):

  d_yy (incl. self)  -- (1/M^2) sum d(y,y'): the term the eval npz records;
  d-bar (excl. self) -- (1/(M(M-1))) sum_{i!=j} d(y,y'): the expected
                        distance between two independent annotator draws;
  floors             -- (1/N + 1/M) * d-bar for the protocols in use: a
                        model sampling EXACTLY from the annotator
                        distribution still scores this GED^2, because the
                        biased reference estimator (utils.py:294-322)
                        averages self-pairs into d_ss and d_yy.

Runs on CPU (data + numpy-scale metric only). Writes
artifacts/dyy_report.txt.
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The container's sitecustomize pins the axon TPU platform BEFORE this
# module's env lines run; force CPU the way tests/conftest.py does (this is
# a data-statistics script, it must not touch -- or block on -- the tunnel).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(n_images: int = 256, hw=(128, 128), m_annot: int = 4) -> None:
    import numpy as np

    from phiseg_tpu.data.synthetic import get_task_generator
    from phiseg_tpu.metrics import pairwise_iou_distance

    protocols = [("val (N=16)", 16), ("test (N=50)", 50), ("dice (N=100)", 100)]
    lines = [
        f"Annotator-diversity report: test split seed=2, n={n_images}, "
        f"{hw[0]}x{hw[1]}, M={m_annot} annotators",
        "distance: 1 - IoU(fg), reference edge cases (both empty -> d=0, "
        "one empty -> d=1); label_range=(1,) as in the eval programs",
        "",
        f"{'task':<12}{'d_yy(incl self)':>18}{'d-bar(excl self)':>18}"
        + "".join(f"{'floor ' + name:>18}" for name, _ in protocols),
    ]
    for task in ("nested", "multiscale", "bfield"):
        gen = get_task_generator(task)
        _, y = gen(n_images, hw, m_annot, seed=2)  # (n, H, W, M)
        d_incl, d_excl = [], []
        for i in range(n_images):
            masks = np.transpose(y[i], (2, 0, 1)).astype(np.int32)  # (M,H,W)
            d = np.asarray(pairwise_iou_distance(masks, masks, (1,), 1))
            d_incl.append(d.mean())
            off = d[~np.eye(m_annot, dtype=bool)]
            d_excl.append(off.mean())
        d_incl = np.asarray(d_incl)
        d_excl = np.asarray(d_excl)
        row = (f"{task:<12}{d_incl.mean():>12.4f} ±{d_incl.std():<5.3f}"
               f"{d_excl.mean():>12.4f} ±{d_excl.std():<5.3f}")
        for _, n_s in protocols:
            floor = (1.0 / n_s + 1.0 / m_annot) * d_excl.mean()
            row += f"{floor:>18.4f}"
        lines.append(row)
        print(lines[-1], flush=True)

    out = os.path.join(REPO, "artifacts", "dyy_report.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:4]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
