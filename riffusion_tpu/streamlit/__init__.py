"""Streamlit playground UI (reference riffusion/streamlit/). The `streamlit`
package is an optional dependency: task business logic lives in plain
functions (importable and tested without it); only render() bodies touch st."""
