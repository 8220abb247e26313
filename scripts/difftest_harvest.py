#!/usr/bin/env python
"""Re-derive the difftest summary from existing per-case output dirs.

The matrix's binaries both ran but the driving process was wall-clock
killed before writing its summary: every comparison input is still on
disk under /tmp/iqtree_difftest/<case>/{ref,tpu}.*, so the verdicts can
be recomputed WITHOUT re-running anything.  Reuses difftest.py's CASES
and comparison helpers verbatim.
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from difftest import CASES, WORK, best_score, compare_supports, rf_distance


def harvest(name, mode, tol=0.05):
    d = os.path.join(WORK, name)
    ref_pre = os.path.join(d, "ref")
    our_pre = os.path.join(d, "tpu")
    if not os.path.isdir(d):
        return {"status": "NOT-RUN"}
    extra = {}
    if mode == "run":
        ok = all(os.path.exists(p + ".boottrees") for p in (ref_pre, our_pre))
        return {"status": "PASS" if ok else "DIFF"}
    if mode == "model":
        pat = r"Best-fit model[^:]*:\s*([A-Za-z0-9+{}.]+)"
        try:
            mr = re.search(pat, open(ref_pre + ".log", errors="replace").read())
            mo = re.search(pat, open(our_pre + ".log", errors="replace").read())
        except OSError:
            return {"status": "NOT-RUN"}
        br = mr.group(1) if mr else None
        bo = mo.group(1) if mo else None
        extra = {"ref_model": br, "tpu_model": bo}
        return {"status": "PASS" if (br and br == bo) else "DIFF", **extra}
    try:
        lr = best_score(ref_pre)
        lo = best_score(our_pre)
    except Exception as e:
        return {"status": f"ERR:{type(e).__name__}"}
    extra = {"ref_lnl": lr, "tpu_lnl": lo}
    if mode == "exact":
        ok = abs(lo - lr) <= tol or lo > lr
    else:
        ok = lo >= lr - max(tol, 0.5)
        rt, ot = ref_pre + ".treefile", our_pre + ".treefile"
        if ok and os.path.exists(rt) and os.path.exists(ot):
            rf = rf_distance(rt, ot)
            extra["rf"] = rf
            if rf != 0 and lo <= lr + 0.01:
                ok = False
            n_common, mean_d, max_d = compare_supports(rt, ot)
            if n_common:
                extra.update(support_splits=n_common,
                             support_mean_delta=round(mean_d, 2),
                             support_max_delta=round(max_d, 2))
                if rf == 0 and mean_d is not None and mean_d > 10.0:
                    ok = False
    return {"status": "PASS" if ok else "DIFF", **extra}


def main():
    rows = []
    failures = 0
    for name, mode, _args in CASES:
        res = {"case": name, "mode": mode, **harvest(name, mode)}
        rows.append(res)
        if res["status"] != "PASS":
            failures += 1
        fmt = lambda x: (f"{x:.3f}" if isinstance(x, float)
                         else "-" if x is None else x)
        detail = " ".join(f"{k}={fmt(v)}" for k, v in res.items()
                          if k not in ("case", "mode", "status"))
        print(f"{name:<22} {mode:<6} {res['status']:<10} {detail}")
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        WORK, "summary_harvest.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\n{len(rows) - failures}/{len(rows)} passed -> {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
