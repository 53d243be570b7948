#!/usr/bin/env python
"""Compatibility entry point mirroring the reference's CLI surface.

``python model.py --train``  — train, save weights, render the test strings.
``python model.py``          — load saved weights (or train if absent), then
                               render the test strings.

All real code lives in the ``ai_font_renderer_tpu`` package; this shim only
preserves the reference's invocation contract (model.py:425-454 in the
reference repo).
"""

import sys

from ai_font_renderer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
