"""Model zoo: pure init/apply modules."""

from . import font_renderer

__all__ = ["font_renderer"]
