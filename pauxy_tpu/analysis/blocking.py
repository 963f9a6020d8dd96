"""Statistical post-processing: reblocking of correlated QMC series.

Counterpart of ``pauxy/analysis/blocking.py:69-340``. The reference depends
on the external ``pyblock`` package; here the Flyvbjerg-Petersen reblocking
(J. Chem. Phys. 91, 461 (1989)) and the automatic block-size selection of
Wolff/Lee et al. are implemented directly in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def reblock_series(x: np.ndarray) -> pd.DataFrame:
    """Flyvbjerg-Petersen blocking analysis of one series.

    Returns a frame with one row per blocking level: block size, mean,
    standard error and the error on the error.
    """
    x = np.asarray(x, dtype=float)
    rows = []
    level = 0
    while len(x) >= 2:
        n = len(x)
        mean = x.mean()
        var = x.var(ddof=1) if n > 1 else 0.0
        se = np.sqrt(var / n)
        se_err = se / np.sqrt(2.0 * (n - 1)) if n > 1 else 0.0
        rows.append(
            {
                "level": level,
                "block_size": 2 ** level,
                "ndata": n,
                "mean": mean,
                "standard error": se,
                "standard error error": se_err,
            }
        )
        if n < 4:
            break
        x = 0.5 * (x[: 2 * (n // 2) : 2] + x[1 : 2 * (n // 2) : 2])
        level += 1
    return pd.DataFrame(rows)


def optimal_block(blocked: pd.DataFrame) -> int:
    """Automatic blocking-level choice: the first level where the error
    estimate plateaus (successive standard errors agree within their own
    error bars) — the usual Flyvbjerg-Petersen stopping rule."""
    ses = blocked["standard error"].values
    errs = blocked["standard error error"].values
    for i in range(len(ses) - 1):
        if abs(ses[i + 1] - ses[i]) <= errs[i + 1] + errs[i]:
            return i
    return max(len(ses) - 1, 0)


def reblock_summary(x: np.ndarray) -> dict:
    """Mean/standard error at the automatically chosen blocking level."""
    blocked = reblock_series(x)
    ix = optimal_block(blocked)
    row = blocked.iloc[ix]
    return {
        "mean": row["mean"],
        "standard error": row["standard error"],
        "standard error error": row["standard error error"],
        "block_size": int(row["block_size"]),
        "nsamples": int(row["ndata"]),
    }


def reblock_mixed(frame: pd.DataFrame, skip: int = 0,
                  columns=("ETotal", "E1Body", "E2Body", "EHybrid",
                           "Weight", "Nav")) -> pd.DataFrame:
    """Reblock the standard mixed-estimator columns
    (``blocking.py:98-137``)."""
    frame = frame[skip:]
    out = {}
    for col in columns:
        if col not in frame.columns:
            continue
        vals = np.asarray(frame[col].values, dtype=complex).real
        s = reblock_summary(vals)
        out[col] = s
    rows = []
    for col, s in out.items():
        rows.append({"estimator": col, **s})
    return pd.DataFrame(rows).set_index("estimator")


def average_ratio(num: np.ndarray, denom: np.ndarray) -> tuple[float, float]:
    """Mean and jackknife error of <num>/<denom> (correlated ratio;
    ``blocking.py:30-68`` average_ratio)."""
    num = np.asarray(num, dtype=complex).real
    denom = np.asarray(denom, dtype=complex).real
    n = len(num)
    full = num.sum() / denom.sum()
    if n < 2:
        return full, 0.0
    jack = np.array(
        [
            (num.sum() - num[i]) / (denom.sum() - denom[i])
            for i in range(n)
        ]
    )
    err = np.sqrt((n - 1) / n * np.sum((jack - jack.mean()) ** 2))
    return full, err


def average_fp(frame: pd.DataFrame, skip: int = 0) -> pd.DataFrame:
    """Free projection: ratio statistics of ENumer/EDenom
    (``blocking.py:69-97``)."""
    frame = frame[skip:]
    num = np.asarray(frame["ENumer"].values, dtype=complex)
    den = np.asarray(frame["EDenom"].values, dtype=complex)
    mean_r, err_r = average_ratio(num.real, den.real)
    return pd.DataFrame(
        [{"E": mean_r, "E_error": err_r, "nsamples": len(num)}]
    )


def analyse_energy(files_or_frame, skip: int = 0) -> pd.DataFrame:
    """One-shot mixed-energy analysis from file path(s) or a frame
    (``blocking.py:292-340`` analyse_estimates / thermal.py:8)."""
    if isinstance(files_or_frame, pd.DataFrame):
        frame = files_or_frame
    else:
        from pauxy_tpu.analysis.extraction import extract_mixed_estimates

        if isinstance(files_or_frame, str):
            files_or_frame = [files_or_frame]
        frame = pd.concat(
            [extract_mixed_estimates(f) for f in files_or_frame]
        )
    return reblock_mixed(frame, skip=skip)
