"""Training-history plotting (per-epoch metric curves to a PNG).

Same artifact shape as the reference (robosat/utils.py:7-22): one chart, one
line per tracked metric, epoch numbers on the x axis.
"""

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot  # noqa: E402


def plot(out, history):
    """Render every metric series in `history` (name -> values) into `out`."""
    fig, ax = pyplot.subplots()

    epochs = max((len(series) for series in history.values()), default=0)
    ax.set_xticks(range(epochs), labels=[str(e + 1) for e in range(epochs)])
    ax.set_xlabel("epoch")
    ax.grid(True)

    for name, series in history.items():
        ax.plot(series, label=name)

    if history:
        ax.legend()

    fig.savefig(out, format="png")
    pyplot.close(fig)
