"""Build the native extensions:

    python setup.py build_ext --inplace

* humid_tpu.cluster._ccluster — CSR clustering with the reference's exact
  traversal semantics (csrc/cluster.cpp).
* humid_tpu.io._cfastqio — bulk FastQ record framing (csrc/fastqio.cpp).

Both are optional: the pure-Python/numpy fallbacks produce identical
results.
"""

import os

from setuptools import Extension, setup

_HAVE_DEFLATE = os.path.exists("/usr/include/libdeflate.h")

setup(
    name="humid_tpu",
    version="0.1.0",
    packages=[
        "humid_tpu",
        "humid_tpu.cluster",
        "humid_tpu.io",
        "humid_tpu.ops",
        "humid_tpu.parallel",
    ],
    entry_points={
        "console_scripts": ["humid-tpu = humid_tpu.cli:main"],
    },
    ext_modules=[
        Extension(
            "humid_tpu.cluster._ccluster",
            sources=["csrc/cluster.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fopenmp"],
            extra_link_args=["-fopenmp"],
        ),
        Extension(
            "humid_tpu.io._cfastqio",
            sources=["csrc/fastqio.cpp"],
            extra_compile_args=(
                ["-O3", "-std=c++17"]
                + (["-DHAVE_LIBDEFLATE"] if _HAVE_DEFLATE else [])
            ),
            libraries=["deflate"] if _HAVE_DEFLATE else [],
        ),
        Extension(
            "humid_tpu._hostops",
            sources=["csrc/hostops.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fopenmp"],
            extra_link_args=["-fopenmp"],
        ),
    ],
)
