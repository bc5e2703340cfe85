"""Build hook: compile the native runtime into the wheel.

The reference packages its one shared lib with scikit-build-core +
CMake (reference pyproject.toml:1-3, CMakeLists.txt:21-32); here the
~90-line driver in shredword_tpu/runtime/build.py does the compile and
this hook runs it at wheel-build time so `pip install .` ships a ready
.so (named by a content hash of the C++ sources).  Environments without
a compiler can still install from sdist: the runtime builds on first
import instead.
"""

import os
import shutil

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        try:
            import importlib.util
            here = os.path.dirname(os.path.abspath(__file__))
            spec = importlib.util.spec_from_file_location(
                "_shred_build",
                os.path.join(here, "shredword_tpu", "runtime", "build.py"))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            so = mod.build(verbose=True)
        except Exception as exc:  # no compiler: defer to first import
            print(f"[shredword_tpu] native build skipped ({exc}); "
                  "the runtime will build on first import")
            return
        dest = os.path.join(self.build_lib, "shredword_tpu", "runtime",
                            os.path.basename(so))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(so, dest)


setup(cmdclass={"build_py": BuildPyWithNative})
