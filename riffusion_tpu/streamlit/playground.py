"""
Streamlit playground app router (reference riffusion/streamlit/playground.py).

Run: streamlit run riffusion_tpu/streamlit/playground.py
or:  python -m riffusion_tpu.streamlit.playground
"""

import importlib


PAGES = {
    "🏠 Home": "riffusion_tpu.streamlit.tasks.home",
    "🌊 Text to Audio": "riffusion_tpu.streamlit.tasks.text_to_audio",
    "✨ Audio to Audio": "riffusion_tpu.streamlit.tasks.audio_to_audio",
    "🎭 Interpolation": "riffusion_tpu.streamlit.tasks.interpolation",
    "✂️ Audio Splitter": "riffusion_tpu.streamlit.tasks.split_audio",
    "📜 Text to Audio Batch": "riffusion_tpu.streamlit.tasks.text_to_audio_batch",
    "📎 Sample Clips": "riffusion_tpu.streamlit.tasks.sample_clips",
    "⏈ Image to Audio": "riffusion_tpu.streamlit.tasks.image_to_audio",
}


def render() -> None:
    import streamlit as st

    st.set_page_config(layout="wide", page_icon="🎸")

    page = st.sidebar.selectbox("Page", list(PAGES.keys()))
    assert page is not None
    module = importlib.import_module(PAGES[page])
    module.render()


if __name__ == "__main__":
    try:
        import streamlit.web.cli as stcli
        import streamlit.runtime.scriptrunner as _sr  # noqa: F401
        import sys

        if "__streamlitmagic__" not in locals():
            import streamlit.runtime

            if streamlit.runtime.exists():
                render()
            else:
                sys.argv = ["streamlit", "run", __file__]
                sys.exit(stcli.main())
    except ImportError as e:
        raise SystemExit(
            "The playground requires streamlit (pip install streamlit). "
            f"Import failed: {e}"
        )
