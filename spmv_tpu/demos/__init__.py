"""CLI demos (the reference's L8 layer, reference demos/CMakeLists.txt:34-55).

Each module exposes ``main() -> int`` and is installed as a console
script (``spmv-demo-{spmv,cg,eig,restrict}``, see pyproject.toml); the
repo-root ``demos/*.py`` files are thin launchers for running from a
source checkout.
"""
