"""Plot-surface smoke tests: the 5-panel figure and the mistiplot CLI.

The reference figure (migrationIO.py:767-829 + MiSTIPlot.py) cannot be
byte-compared, so these pin the structure: panel count, step-line counts
per panel, the split marker, the working ``--fpsmc`` overlay (broken in
the reference, MiSTIPlot.py:104), and that the CLI renders a nonempty
file end-to-end from a real .mi fixture.
"""

import os

import pytest

matplotlib = pytest.importorskip("matplotlib")

from misti_tpu.io import mi_format
from misti_tpu.io import psmc as io_psmc
from misti_tpu import plotting

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
MI = os.path.join(FIX, "ref_fit.mi")


def test_plot_migration_panels(tmp_path):
    data = mi_format.read_migration(MI)
    out = tmp_path / "fig.pdf"
    fig_axes = {}

    orig_save = plotting.MiPlot.save

    def spy_save(self, fout, limits=None):
        fig_axes["axes"] = self.fig.axes
        fig_axes["main"] = self.ax
        return orig_save(self, fout, limits)

    plotting.MiPlot.save = spy_save
    try:
        plotting.plot_migration(data, str(out))
    finally:
        plotting.MiPlot.save = orig_save

    assert out.exists() and out.stat().st_size > 1000
    # 5 panels: main EPS + P(both in 1) + P(both in 2) + P(split) + no-coal
    assert len(fig_axes["axes"]) == 5
    main = fig_axes["main"]
    # misti1/misti2 (+ psmc1/psmc2 if the .mi carries lambdah columns)
    labels = [l.get_label() for l in main.get_lines()]
    assert "misti1" in labels and "misti2" in labels
    # probability panels each carry one step line per genome
    for ax in fig_axes["axes"][1:]:
        assert len(ax.get_lines()) == 2
    # log-x on every panel (reference semilogx)
    for ax in fig_axes["axes"]:
        assert ax.get_xscale() == "log"


def test_plot_migration_hide_probs(tmp_path):
    data = mi_format.read_migration(MI)
    out = tmp_path / "fig.pdf"
    fig_axes = {}
    orig_save = plotting.MiPlot.save

    def spy_save(self, fout, limits=None):
        fig_axes["axes"] = self.fig.axes
        return orig_save(self, fout, limits)

    plotting.MiPlot.save = spy_save
    try:
        plotting.plot_migration(data, str(out), hide_probs=True)
    finally:
        plotting.MiPlot.save = orig_save
    assert out.exists() and len(fig_axes["axes"]) == 1


def test_fpsmc_overlay_adds_raw_trajectories(tmp_path):
    """The working --fpsmc path: raw PSMC EPS overlaid on the main panel
    (the reference's MiSTIPlot.py:104 calls ReadPSMC with a stale
    signature and crashes -- documented deviation, implemented intent)."""
    data = mi_format.read_migration(MI)
    overlay = io_psmc.read_psmc(os.path.join(FIX, "synth1.psmc"),
                                os.path.join(FIX, "synth2.psmc"), 0, -1)
    out = tmp_path / "fig.pdf"
    fig_axes = {}
    orig_save = plotting.MiPlot.save

    def spy_save(self, fout, limits=None):
        fig_axes["main"] = self.ax
        return orig_save(self, fout, limits)

    plotting.MiPlot.save = spy_save
    try:
        plotting.plot_migration(data, str(out), psmc_overlay=overlay)
    finally:
        plotting.MiPlot.save = orig_save
    labels = [l.get_label() for l in fig_axes["main"].get_lines()]
    assert "psmc1_raw" in labels and "psmc2_raw" in labels


def test_mistiplot_cli_end_to_end(tmp_path, capsys):
    from misti_tpu.cli import mistiplot

    out = tmp_path / "cli_fig.pdf"
    rc = mistiplot.main([MI, "--funits", "/nonexistent", "-o", str(out),
                         "--fpsmc", os.path.join(FIX, "synth1.psmc"),
                         os.path.join(FIX, "synth2.psmc")])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    assert "Output file" in capsys.readouterr().out
