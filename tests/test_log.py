"""Log artifact contract: append, flush-per-line, echo, context manager."""

import io

from robosat_tpu.log import Log


def test_log_appends_and_echoes(tmp_path):
    path = tmp_path / "log"
    echo = io.StringIO()

    with Log(str(path), out=echo) as log:
        log.log("first line")
        # Flushed per line: visible to a concurrent reader immediately.
        assert "first line" in path.read_text()
        log.log("second line")

    # Append mode: a new Log instance extends the same file.
    with Log(str(path), out=None) as log:
        log.log("third line")

    lines = path.read_text().splitlines()
    assert lines == ["first line", "second line", "third line"]
    assert echo.getvalue().splitlines() == ["first line", "second line"]
