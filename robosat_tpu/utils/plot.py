"""Training-history plotting (per-epoch metric curves to a PNG).

Same artifact as the reference (robosat/utils.py:7-22).
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot(out, history):
    """Plot every metric series in `history` (name -> list of values) to `out`."""
    plt.figure()

    n = max((len(v) for v in history.values()), default=0)
    plt.xticks(range(n), [v + 1 for v in range(n)])
    plt.grid()

    for values in history.values():
        plt.plot(values)

    plt.xlabel("epoch")
    plt.legend(list(history))
    plt.savefig(out, format="png")
    plt.close()
