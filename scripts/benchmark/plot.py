"""Benchmark figure generation (SVG into docs/assets/benchmarking/).

The analog of the reference's six CairoMakie plotters
(scripts/benchmark/plot_*.jl, ~730 LoC): one figure per results artifact,
reading the committed JSON series produced by the runner scripts.

Usage: python scripts/benchmark/plot.py [name ...]
       (no args = every artifact present in results/)

Design: categorical colors are the validated default palette slots in fixed
order (series identity never repainted); one axis per figure; log-scale
time axes; recessive grid; direct labels next to line ends plus a legend.
"""

from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RESULTS = os.path.join(os.path.dirname(__file__), "results")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "..", "docs", "assets", "benchmarking"
)

# validated categorical palette, fixed slot order (identity, never cycled)
C1, C2, C3, C4 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
TEXT, MUTED = "#0b0b0b", "#52514e"


def _style(ax, xlabel, ylabel, title):
    ax.set_xlabel(xlabel, color=TEXT)
    ax.set_ylabel(ylabel, color=TEXT)
    ax.set_title(title, color=TEXT, fontsize=11, loc="left")
    ax.grid(True, which="major", color="#e6e5e0", linewidth=0.6, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=9)


def _load(name):
    path = os.path.join(RESULTS, f"{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _series_xy(series, key):
    pts = series["points"]
    ns = sorted(int(k) for k in pts)
    return ns, [pts[str(n)][key] for n in ns]


def _save(fig, name):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.svg")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def plot_svd_rsvd(data):
    fig, ax = plt.subplots(figsize=(6.4, 4.0))
    for key, label, color in (
        ("svd", "dense SVD", C1),
        ("rsvd", "randomized SVD", C2),
    ):
        ns, ts = _series_xy(data["series"][key], "seconds")
        ax.semilogy(ns, ts, color=color, linewidth=2, marker="o",
                    markersize=4, label=label, zorder=3)
        ax.annotate(label, (ns[-1], ts[-1]), textcoords="offset points",
                    xytext=(6, 0), fontsize=9, color=TEXT)
    _style(ax, "n (signal = 2^n samples)", "wall-clock seconds",
           "Middle-bipartition truncated SVD vs randomized SVD")
    ax.legend(frameon=False, fontsize=9)
    _save(fig, "svd_rsvd")


def plot_tt_decomp(data):
    fig, ax = plt.subplots(figsize=(6.4, 4.0))
    for key, label, color in (
        ("svd", "signal_mps(method='svd')", C1),
        ("rsvd", "signal_mps(method='rsvd')", C2),
    ):
        ns, ts = _series_xy(data["series"][key], "seconds")
        ax.semilogy(ns, ts, color=color, linewidth=2, marker="o",
                    markersize=4, label=label, zorder=3)
    _style(ax, "n", "wall-clock seconds",
           "Full tensor-train encode sweep (random signal)")
    ax.legend(frameon=False, fontsize=9)
    _save(fig, "tt_decomp")


def plot_mpo_bond_dim(data):
    fig, ax = plt.subplots(figsize=(6.4, 4.0))
    for key, label, color in (
        ("qft", "QFT", C1),
        ("dt", "DT", C2),
        ("zt", "zT", C3),
    ):
        ns, bonds = _series_xy(data["series"][key], "max_bond")
        ax.plot(ns, bonds, color=color, linewidth=2, marker="o",
                markersize=4, label=label, zorder=3)
        ax.annotate(f"{label} (D={bonds[-1]})", (ns[-1], bonds[-1]),
                    textcoords="offset points", xytext=(6, 0), fontsize=9,
                    color=TEXT)
    _style(ax, "n", "max bond dimension",
           f"Transform-MPO bond plateaus (cutoff {data['params']['cutoff']:g})")
    ax.legend(frameon=False, fontsize=9, loc="upper left")
    _save(fig, "mpo_bond_dim")


def plot_qft_vs_fft(data):
    fig, ax = plt.subplots(figsize=(6.4, 4.0))
    for key, label, color in (
        ("qft_apply_only", "QFT-MPO apply only", C1),
        ("rsvd_encode_plus_apply", "encode + apply", C2),
        ("dense_fft", "dense FFT", C3),
    ):
        if key not in data["series"]:
            continue
        ns, ts = _series_xy(data["series"][key], "seconds")
        ax.semilogy(ns, ts, color=color, linewidth=2, marker="o",
                    markersize=4, label=label, zorder=3)
    _style(ax, "n", "wall-clock seconds", "QFT pipeline vs dense FFT")
    ax.legend(frameon=False, fontsize=9)
    _save(fig, "qft_vs_fft")


def plot_zt_full_runtime(data):
    fig, ax = plt.subplots(figsize=(6.4, 4.0))
    colors = [C1, C2, C3, C4]
    for i, (key, series) in enumerate(sorted(data["series"].items())):
        ns, ts = _series_xy(series, "total_seconds")
        ax.semilogy(ns, ts, color=colors[i % 4], linewidth=2, marker="o",
                    markersize=4, label=key, zorder=3)
    _style(ax, "n", "wall-clock seconds",
           "zT end-to-end runtime (encode + apply + 4096-point scan)")
    ax.legend(frameon=False, fontsize=9)
    _save(fig, "zt_full_runtime")


PLOTTERS = {
    "svd_rsvd": plot_svd_rsvd,
    "tt_decomp": plot_tt_decomp,
    "mpo_bond_dim": plot_mpo_bond_dim,
    "qft_vs_fft": plot_qft_vs_fft,
    "zt_full_runtime": plot_zt_full_runtime,
}


def main():
    names = sys.argv[1:] or list(PLOTTERS)
    for name in names:
        data = _load(name)
        if data is None:
            print(f"skip {name}: no results artifact")
            continue
        PLOTTERS[name](data)


if __name__ == "__main__":
    main()
