"""`rs serve` HTTP contract: index, tile segmentation, guards, CORS."""

import http.server
import functools
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from robosat_tpu.colors import make_palette


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A running tile server backed by a local upstream and a tiny model."""
    from robosat_tpu.models import unet
    from robosat_tpu.parallel.steps import make_segment_step
    from robosat_tpu.tools import serve

    root = tmp_path_factory.mktemp("serve")

    # Upstream imagery server.
    upstream_dir = root / "upstream"
    (upstream_dir / "18" / "1" ).mkdir(parents=True)
    Image.fromarray(np.full((64, 64, 3), 99, np.uint8)).save(upstream_dir / "18" / "1" / "2.png")
    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(upstream_dir))
    upstream = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=upstream.serve_forever, daemon=True).start()

    # Predictor without the CLI (avoids checkpoint file plumbing).
    class TinyPredictor(serve.Predictor):
        def __init__(self):
            self.params, self.state = unet.init(0, num_classes=2)
            self.step = make_segment_step(unet)
            self.palette = make_palette("denim", "orange")
            self.tile_size = 64

    import requests

    predictor = TinyPredictor()
    tile_handler = serve.make_handler(
        predictor,
        requests.Session(),
        "http://127.0.0.1:{}/{{z}}/{{x}}/{{y}}.png".format(upstream.server_address[1]),
        token="testtoken",
        tile_size=64,
        port=0,
    )
    server = http.server.HTTPServer(("127.0.0.1", 0), tile_handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    yield "http://127.0.0.1:{}".format(server.server_address[1])

    server.shutdown()
    upstream.shutdown()


def _get(url):
    req = urllib.request.Request(url)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), b""


def test_index(served):
    status, headers, body = _get(served + "/")
    assert status == 200
    assert b"testtoken" in body
    assert headers["Access-Control-Allow-Origin"] == "*"


def test_index_is_swipe_compare_viewer(served):
    """The viewer is a before/after swipe compare (capability parity with the
    reference template, robosat/tools/templates/map.html:37-80): two synced
    map panes, a draggable divider clipping the mask overlay, plus an
    opacity slider."""
    _, _, body = _get(served + "/")
    html = body.decode()
    assert 'id="before"' in html and 'id="after"' in html  # two map panes
    assert 'id="swipe"' in html and "pointerdown" in html  # draggable divider
    assert "clipPath" in html  # after-pane clipped at the divider
    assert "/{z}/{x}/{y}.png" in html  # mask overlay source is this server
    assert 'id="slider"' in html  # opacity control retained


def test_tile_segmentation(served):
    status, headers, body = _get(served + "/18/1/2.png")
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    import io

    img = Image.open(io.BytesIO(body))
    assert img.mode == "P"
    assert img.size == (64, 64)
    assert np.asarray(img).max() <= 1  # binary class indices


def test_wrong_zoom_404(served):
    status, _, _ = _get(served + "/17/1/2.png")
    assert status == 404


def test_missing_upstream_500(served):
    status, _, _ = _get(served + "/18/9/9.png")
    assert status == 500


def test_garbage_path_404(served):
    status, _, _ = _get(served + "/foo/bar")
    assert status == 404
