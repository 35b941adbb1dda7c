"""Real-TPU numeric parity record for the Pallas fused residual-CE kernel.

CLAUDE.md invariant: "Pallas kernels must be validated on real TPU, not only
interpret mode" (Mosaic rejects constructs the CPU interpreter accepts).
tests/test_pallas_ops.py proves correctness on the CPU interpreter; this
script runs the SAME fwd/bwd/weighted-cotangent/bf16 comparisons on the
actual chip (Mosaic-compiled) vs the plain-XLA reference path, and writes
the max-abs/rel differences to artifacts/pallas_tpu_parity.txt so the
invariant is closed by a recorded artifact, not recollection (VERDICT r3,
next-round item 6).

Shapes are the production ones: the flagship phiseg_7_5 objective calls the
kernel with 5 levels at 128x128xC logits over batch 12.

Usage (TPU, ~2 min after compile cache):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_tpu_parity.py
"""

from __future__ import annotations

import datetime
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phiseg_tpu.nn.losses import multinoulli_loss_with_logits
    from phiseg_tpu.ops import fused_residual_ce
    from phiseg_tpu.utils.cache import enable_persistent_cache
    from phiseg_tpu.utils.tpu_lock import TpuLock

    enable_persistent_cache()
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"ERROR: need a real TPU, got {dev.platform}")
        return 1

    def ref_per_level(logits, s_oh):
        out, acc = [], None
        for i in reversed(range(logits.shape[0])):
            acc = logits[i] if acc is None else acc + logits[i]
            out.append(multinoulli_loss_with_logits(s_oh, acc))
        return jnp.stack(out[::-1])

    lines = [
        "Pallas fused_residual_ce: real-TPU (Mosaic) vs plain-XLA parity",
        f"device: {dev}  jax {jax.__version__}  "
        f"recorded {datetime.datetime.now(datetime.timezone.utc).isoformat()}",
        "",
        f"{'case':<44}{'max_abs':>12}{'max_rel':>12}{'rel|ref|>1e-4':>14}"
        "  verdict",
    ]
    worst = 0.0

    def record(name, got, want, tol):
        nonlocal worst
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        diff = np.abs(got - want)
        abs_d = float(np.max(diff))
        rel_d = float(np.max(diff / (np.abs(want) + 1e-12)))
        # rel err restricted to elements with a meaningful denominator;
        # raw max_rel is unnormalised where |ref| ~ 0 (VERDICT r4 weak #6)
        mask = np.abs(want) > 1e-4
        rel_m = float(np.max(diff[mask] / np.abs(want[mask]))) if mask.any() else 0.0
        ok = rel_d <= tol or abs_d <= tol
        gate = "rel" if rel_d <= tol else "abs"
        worst = max(worst, rel_d if not ok else 0.0)
        lines.append(f"{name:<44}{abs_d:>12.3e}{rel_d:>12.3e}{rel_m:>14.3e}  "
                     f"{'OK' if ok else 'FAIL'} ({gate} tol {tol:g})")
        return ok

    all_ok = True
    with TpuLock("pallas-parity"):
        for levels, b, hw, c, seed, dtype, tol in [
            (5, 12, 128, 2, 0, jnp.float32, 1e-4),   # production shape
            (3, 2, 16, 2, 1, jnp.float32, 1e-4),
            (2, 3, 10, 2, 2, jnp.float32, 1e-4),     # non-divisible tiles
            (5, 12, 128, 2, 3, jnp.bfloat16, 2e-2),  # production bf16 path
        ]:
            rng = jax.random.PRNGKey(seed)
            logits = (jax.random.normal(rng, (levels, b, hw, hw, c),
                                        jnp.float32) * 3.0).astype(dtype)
            s = (jax.random.uniform(jax.random.fold_in(rng, 1),
                                    (b, hw, hw)) > 0.6).astype(jnp.int32)
            s_oh = jax.nn.one_hot(s, c)
            tag = f"L{levels} b{b} {hw}x{hw} {np.dtype(dtype).name}"

            got = jax.jit(lambda lg: fused_residual_ce(lg, s_oh, 256))(logits)
            want = ref_per_level(logits.astype(jnp.float32), s_oh)
            all_ok &= record(f"forward  {tag}", got, want, tol)

            w = jnp.linspace(1.0, 2.0, levels)
            g_fused = jax.jit(jax.grad(
                lambda lg: jnp.sum(w * fused_residual_ce(lg, s_oh, 256))
            ))(logits)
            g_ref = jax.grad(
                lambda lg: jnp.sum(w * ref_per_level(lg.astype(jnp.float32),
                                                     s_oh))
            )(logits)
            all_ok &= record(f"weighted-grad {tag}",
                             g_fused.astype(jnp.float32),
                             g_ref.astype(jnp.float32),
                             max(tol, 1e-3 if dtype == jnp.float32 else 5e-2))

    lines.append("")
    lines.append(
        "note: max_rel divides by |ref| elementwise and is unnormalised where\n"
        "|ref| ~ 0 (gradient zero-crossings), so large values there are not\n"
        "errors; the pass gate is `rel<=tol OR abs<=tol` and the verdict column\n"
        "names which branch passed. `rel|ref|>1e-4` is the max rel err over\n"
        "elements with a meaningful denominator."
    )
    lines.append("")
    lines.append("ALL OK" if all_ok else f"FAILURES (worst rel {worst:.3e})")
    out = os.path.join(REPO, "artifacts", "pallas_tpu_parity.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")
    return 0 if all_ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
