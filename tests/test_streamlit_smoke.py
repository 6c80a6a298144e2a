"""
Streamlit page smoke tests: every playground page's render() must execute
without raising on first paint (reference playground behavior:
/root/reference/riffusion/streamlit/playground.py:32-37).

Runs only when streamlit is installed (the `ui` extra; CI installs it in the
dedicated job in .github/workflows/ci.yml). Pages that need an upload or a
model early-return on first paint, so first paint with a tiny random-weight
pipeline is cheap and model-free.
"""

import pytest

st = pytest.importorskip("streamlit")
pytest.importorskip("streamlit.testing.v1")

from streamlit.testing.v1 import AppTest  # noqa: E402

from riffusion_tpu.streamlit.playground import PAGES  # noqa: E402

_PAGE_SCRIPT = """
import importlib

import riffusion_tpu.streamlit.util as util

# tiny random-weight pipeline so no checkpoint/network is needed
util.DEFAULT_CHECKPOINT = "random:tiny"

module = importlib.import_module({module!r})
module.render()
"""


@pytest.mark.parametrize("title,module", sorted(PAGES.items()))
def test_page_first_paint(title, module):
    at = AppTest.from_string(_PAGE_SCRIPT.format(module=module))
    at.run(timeout=300)
    assert not at.exception, f"{module} raised on first paint: {at.exception}"


def test_router_first_paint():
    at = AppTest.from_string(
        "from riffusion_tpu.streamlit.playground import render\nrender()\n"
    )
    at.run(timeout=300)
    assert not at.exception
