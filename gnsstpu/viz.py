"""Diagnostic plots: probe, acquisition, tracking, navigation.

The framework's replacement for the reference's de-facto assertion layer
(SURVEY.md §4: plot scripts are the human-inspected checks) — Scilab
probeData.sci, plotAcquisition.sci, plotTracking.sci, plotNavigation.sci
and the wxWidgets gse panels. Renders PNG files with matplotlib (Agg);
every function takes framework result objects directly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def probe_data(source, sig, out_png: str, n_ms: int = 10) -> None:
    """Raw-signal probe: time series, histogram, PSD (probeData.sci)."""
    n = int(n_ms * sig.fs * 1e-3)
    x = source.read(0, n)
    fig, axs = plt.subplots(2, 2, figsize=(11, 7))
    t_us = np.arange(min(n, 400)) / sig.fs * 1e6
    axs[0, 0].plot(t_us, x[: len(t_us), 0], lw=0.8, label="I")
    axs[0, 0].plot(t_us, x[: len(t_us), 1], lw=0.8, label="Q", alpha=0.7)
    axs[0, 0].set(title="Time domain", xlabel="time [µs]")
    axs[0, 0].legend()
    axs[0, 1].hist(x[:, 0], bins=64)
    axs[0, 1].set(title="Histogram (I)")
    z = x[:, 0] + 1j * x[:, 1]
    seg = 4096
    k = len(z) // seg
    psd = np.mean(np.abs(np.fft.fft(
        z[: k * seg].reshape(k, seg), axis=1)) ** 2, axis=0)
    f = np.fft.fftfreq(seg, 1.0 / sig.fs)
    order = np.argsort(f)
    axs[1, 0].semilogy(f[order] / 1e6, psd[order], lw=0.8)
    axs[1, 0].set(title="PSD", xlabel="freq [MHz]")
    axs[1, 1].scatter(x[:2000, 0], x[:2000, 1], s=2, alpha=0.3)
    axs[1, 1].set(title="I/Q constellation")
    fig.suptitle(f"probe: {getattr(source, 'path', type(source).__name__)}")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def plot_acquisition(acq, out_png: str,
                     threshold: Optional[float] = None) -> None:
    """Per-PRN peak metric bars (plotAcquisition.sci)."""
    P = len(acq.peak_metric)
    fig, ax = plt.subplots(figsize=(11, 4))
    colors = ["tab:green" if d else "tab:blue" for d in acq.detected]
    ax.bar(np.arange(1, P + 1), acq.peak_metric, color=colors)
    if threshold is not None:
        ax.axhline(threshold, color="r", ls="--", lw=1,
                   label=f"threshold {threshold}")
        ax.legend()
    ax.set(xlabel="PRN / channel", ylabel="peak / 2nd peak",
           title="Acquisition metric")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def plot_tracking(tr, chan: int, out_png: str) -> None:
    """Per-channel tracking panel (plotTracking.sci): prompt I/Q scatter,
    nav-bit stream, discriminators, E/P/L envelopes, Doppler."""
    i_p, q_p = tr.i_p[chan], tr.q_p[chan]
    t = np.arange(len(i_p)) * 1e-3
    fig, axs = plt.subplots(3, 2, figsize=(12, 9))
    axs[0, 0].scatter(i_p, q_p, s=2, alpha=0.3)
    axs[0, 0].set(title="Discrete-time constellation", xlabel="I_P",
                  ylabel="Q_P")
    axs[0, 1].plot(t, i_p, lw=0.6)
    axs[0, 1].set(title="Nav bits (I_P)", xlabel="s")
    axs[1, 0].plot(t, tr.dll_disc[chan], lw=0.5)
    axs[1, 0].set(title="DLL discriminator")
    axs[1, 1].plot(t, tr.pll_disc[chan], lw=0.5)
    axs[1, 1].set(title="PLL discriminator")
    e = np.hypot(tr.i_e[chan], tr.q_e[chan])
    p = np.hypot(i_p, q_p)
    l = np.hypot(tr.i_l[chan], tr.q_l[chan])
    axs[2, 0].plot(t, e, lw=0.5, label="E")
    axs[2, 0].plot(t, p, lw=0.5, label="P")
    axs[2, 0].plot(t, l, lw=0.5, label="L")
    axs[2, 0].legend()
    axs[2, 0].set(title="Correlation envelopes")
    axs[2, 1].plot(t, tr.carr_freq[chan], lw=0.6)
    axs[2, 1].set(title="Carrier frequency [Hz]", xlabel="s")
    fig.suptitle(f"channel {chan} PRN {int(tr.prn[chan])}")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def plot_navigation(nav, out_png: str) -> None:
    """Navigation panel (plotNavigation.sci): UTM E/N scatter around the
    mean, height and clock-bias series, DOP, satellite count."""
    v = nav.valid
    fig, axs = plt.subplots(2, 2, figsize=(11, 8))
    if np.any(v):
        e = nav.utm_e[v] - np.mean(nav.utm_e[v])
        n = nav.utm_n[v] - np.mean(nav.utm_n[v])
        axs[0, 0].scatter(e, n, s=8)
        axs[0, 0].set(title="UTM scatter vs mean [m]", xlabel="E",
                      ylabel="N", aspect="equal")
        t = nav.t_ms[v] / 1e3
        axs[0, 1].plot(t, nav.height[v], ".-")
        axs[0, 1].set(title="Height [m]", xlabel="s")
        axs[1, 0].plot(t, nav.dop[v][:, 0], ".-", label="GDOP")
        axs[1, 0].plot(t, nav.dop[v][:, 2], ".-", label="HDOP")
        axs[1, 0].legend()
        axs[1, 0].set(title="DOP", xlabel="s")
    axs[1, 1].plot(nav.t_ms / 1e3, nav.n_sats, ".-")
    axs[1, 1].set(title="satellites used", xlabel="s")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
