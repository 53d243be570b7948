"""Thin shim over the product surface: `afr train-placement`.

The learned-placement training pipeline lives in
ai_font_renderer_tpu/train/placement_cli.py and is reachable as
``python -m ai_font_renderer_tpu train-placement`` (or ``afr
train-placement``). This file remains only so the round-2/3 campaign
queue scripts (tools/round*_queue*.sh) keep replaying verbatim; flags
are identical.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_font_renderer_tpu.train.placement_cli import main

if __name__ == "__main__":
    sys.exit(main())
