"""Pure-Python oracle for the kmcp profile funnel (stages 1-4 + EM) —
dict-and-loop implementation of the exact semantics frozen in
kmcp_ray/profile_em.py (which re-derives /root/reference/kmcp/cmd/
profile.go).  Used as the golden reference the distributed engine must
match (the demo-profiling/mock.gs.profile role from SURVEY §5)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

NBINS = 1024


def _qbin(q):
    return min(int(q * NBINS), NBINS - 1)


def _p90(hist: dict) -> float:
    total = sum(hist.values())
    if total <= 0:
        return 0.0
    cum = 0.0
    for b in sorted(hist):
        cum += hist[b]
        if cum >= 0.9 * total:
            return (b + 0.5) / NBINS
    return (max(hist) + 0.5) / NBINS


def oracle_profile(table, params):
    """table: pyarrow Table (query, target, qcov, q_kept, t_kept
    [, chunk, nchunk]); params: ProfileParams.  Returns a pandas
    DataFrame with the same columns as profile_funnel."""
    import pandas as pd
    df = table.to_pandas()
    if "chunk" not in df:
        df["chunk"] = 0
    if "nchunk" not in df:
        df["nchunk"] = 1
    df = df[df.qcov >= params.min_qcov]

    gsize, nchunk = {}, {}
    for t, g, nc in zip(df.target, df.t_kept, df.nchunk):
        gsize.setdefault(t, int(g))
        nchunk.setdefault(t, int(nc))

    # per-query grouped matches: query -> target -> list of rows
    per_q = defaultdict(lambda: defaultdict(list))
    for row in df.itertuples():
        per_q[row.query][row.target].append(row)

    # ---- stage 1 ----
    match1 = defaultdict(lambda: defaultdict(float))   # t -> chunk -> credit
    uniq1 = defaultdict(float)
    hic1 = defaultdict(float)
    for q, tm in per_q.items():
        for t, rows in tm.items():
            ms = len(rows)
            best = max(r.qcov for r in rows)
            for r in rows:
                match1[t][r.chunk] += 1.0 / ms
            if len(tm) == 1:
                uniq1[t] += 1
                if best >= params.hic_qcov:
                    hic1[t] += 1
    sum_match1 = {t: sum(cs.values()) for t, cs in match1.items()}
    cands = []
    for t in sum_match1:
        fp = sum(1 for v in match1[t].values() if v > 0) / max(nchunk[t], 1)
        if (sum_match1[t] >= params.min_reads
                and uniq1.get(t, 0) >= params.min_uniq_reads
                and hic1.get(t, 0) >= params.min_hic_ureads
                and fp >= params.min_frags_prop):
            cands.append(t)
    cands = set(cands)
    if not cands:
        return pd.DataFrame(columns=[
            "target", "percentage", "coverage", "score", "chunks_frac",
            "reads", "ureads", "hic_ureads", "refsize"])

    # ---- stage 2: co-occurrence ----
    cooc = defaultdict(float)
    if not params.no_amb_corr:
        for q, tm in per_q.items():
            cs = sorted(t for t in tm if t in cands)
            for i in range(len(cs) - 1):
                for j in range(i + 1, len(cs)):
                    cooc[(cs[i], cs[j])] += 1

    # ---- stage 3: deletion + equal split ----
    match3 = defaultdict(lambda: defaultdict(float))
    qlen3 = defaultdict(lambda: defaultdict(float))
    uniq3 = defaultdict(float)
    hic3 = defaultdict(float)
    hist_uniq3 = defaultdict(lambda: defaultdict(float))
    surviving_q = {}                     # query -> surviving target list
    for q, tm in per_q.items():
        cts = [t for t in tm if t in cands]
        if not cts:
            continue
        best = {t: max(r.qcov for r in tm[t]) for t in cts}
        cts.sort(key=lambda t: (-best[t], t))
        alive = {t: True for t in cts}
        if len(cts) > 1 and not params.no_amb_corr:
            for i in range(len(cts) - 1):
                ti = cts[i]
                if not alive[ti]:
                    continue
                for j in range(i + 1, len(cts)):
                    tj = cts[j]
                    if not alive[tj]:
                        continue
                    key = (ti, tj) if ti < tj else (tj, ti)
                    shared = cooc.get(key, 0.0)
                    if (sum_match1[ti] * (1 - params.min_dreads_prop) >= shared
                            and uniq1.get(tj, 0)
                            < uniq1.get(ti, 0) * params.max_mismatch_err):
                        alive[tj] = False
                    elif (sum_match1[tj] * (1 - params.min_dreads_prop) >= shared
                            and uniq1.get(ti, 0)
                            < uniq1.get(tj, 0) * params.max_mismatch_err):
                        alive[ti] = False
                        break
        surv = [t for t in cts if alive[t]]
        surviving_q[q] = surv
        if not surv:
            continue
        prop = 1.0 / len(surv)
        for t in surv:
            ms = len(tm[t])
            for r in tm[t]:
                match3[t][r.chunk] += prop / ms
                qlen3[t][r.chunk] += r.q_kept * prop / ms
        if len(surv) == 1:
            t = surv[0]
            uniq3[t] += 1
            if best[t] >= params.hic_qcov:
                hic3[t] += 1
            hist_uniq3[t][_qbin(best[t])] += 1

    def coverage_of(qlen_map, wl):
        cov = {}
        for t in wl:
            qs = qlen_map.get(t, {})
            if params.norm_abund == "mean":
                cov[t] = sum(qs.values()) / max(gsize[t], 1)
            else:
                vals = [v for v in qs.values() if v > 0]
                nch = len(qs)
                if not vals:
                    cov[t] = 0.0
                else:
                    v = min(vals) if params.norm_abund == "min" else max(vals)
                    cov[t] = v * nch / max(gsize[t], 1)
        return cov

    wl = []
    for t in cands:
        m = sum(match3[t].values())
        fp = sum(1 for v in match3[t].values()
                 if v >= params.min_reads) / max(nchunk[t], 1)
        # rel-depth population stddev over the full n-chunk vector
        n = max(nchunk[t], 1)
        total = sum(qlen3[t].values())
        if total > 0:
            rel = [qlen3[t].get(c, 0.0) / total * n for c in range(n)]
            mean = sum(rel) / n
            std = (sum((r - mean) ** 2 for r in rel) / n) ** 0.5
        else:
            std = 0.0
        if (m >= params.min_reads and uniq3.get(t, 0) >= params.min_uniq_reads
                and hic3.get(t, 0) >= params.min_hic_ureads
                and fp >= params.min_frags_prop
                and std <= params.max_frags_depth_stdev):
            wl.append(t)
    wl = sorted(wl)
    if not wl:
        import pandas as pd
        return pd.DataFrame(columns=[
            "target", "percentage", "coverage", "score", "chunks_frac",
            "reads", "ureads", "hic_ureads", "refsize"])
    wl_set = set(wl)
    cov = coverage_of(qlen3, wl)
    hist_uniq = hist_uniq3
    m_final = {t: sum(match3[t].values()) for t in wl}

    # ---- stage 4 EM ----
    dom_pre = None
    for _ in range(max(1, params.max_iters)):
        total = sum(cov.values())
        pct = {t: (cov[t] / total * 100.0 if total > 0 else 0.0) for t in wl}
        dom = max(pct.values()) if pct else 0.0
        if dom_pre is not None and abs(dom - dom_pre) < params.abund_pct_threshold:
            break
        dom_pre = dom
        matchE = defaultdict(lambda: defaultdict(float))
        qlenE = defaultdict(lambda: defaultdict(float))
        histE = defaultdict(lambda: defaultdict(float))
        for q, tm in per_q.items():
            wts = [t for t in tm if t in wl_set]
            if not wts:
                continue
            best = {t: max(r.qcov for r in tm[t]) for t in wts}
            if len(wts) == 1:
                props = {wts[0]: 1.0}
                t = wts[0]
                histE[t][_qbin(best[t])] += 1
            else:
                denom = sum(cov[t] for t in wts)
                if denom > 0:
                    props = {t: cov[t] / denom for t in wts}
                else:
                    props = {t: 1.0 / len(wts) for t in wts}
            for t, pr in props.items():
                if pr <= 0:
                    continue
                ms = len(tm[t])
                for r in tm[t]:
                    matchE[t][r.chunk] += pr / ms
                    qlenE[t][r.chunk] += r.q_kept * pr / ms
        cov = coverage_of(qlenE, wl)
        hist_uniq = histE
        m_final = {t: sum(matchE[t].values()) for t in wl}

    total = sum(cov.values())
    pct = {t: (cov[t] / total * 100.0 if total > 0 else 0.0) for t in wl}

    keep = {t: True for t in wl}
    if params.low_abc_pct > 0 and len(wl) > 1:
        order = sorted(wl, key=lambda t: -cov[t])
        acc = 0.0
        dropped = []
        for t in reversed(order):
            acc += pct[t]
            if acc > params.low_abc_pct:
                break
            dropped.append(t)
        if dropped:
            for t in dropped:
                keep[t] = False
            total = sum(cov[t] for t in wl if keep[t])
            pct = {t: (cov[t] / total * 100.0 if keep[t] else 0.0) for t in wl}

    import pandas as pd
    rows = []
    for t in sorted([t for t in wl if keep[t]], key=lambda t: -cov[t]):
        fp3 = sum(1 for v in match3[t].values()
                  if v >= params.min_reads) / max(nchunk[t], 1)
        rows.append(dict(
            target=t, percentage=pct[t], coverage=cov[t],
            score=_p90(hist_uniq.get(t, {})) * 100.0,
            chunks_frac=fp3, reads=m_final[t],
            ureads=uniq3.get(t, 0.0), hic_ureads=hic3.get(t, 0.0),
            refsize=gsize[t]))
    return pd.DataFrame(rows)
