"""Build the native library: python -m sift4g_tpu.native"""

import sys

from . import build, load

if __name__ == "__main__":
    ok = build() and load() is not None
    print("native library:", "built and loadable" if ok else "BUILD FAILED")
    sys.exit(0 if ok else 1)
