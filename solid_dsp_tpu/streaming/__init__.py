"""Streaming state containers: ChainState pytrees, block framing, ring buffers."""

from .state import ChainState  # noqa: F401
from .ring import CircularBuffer, BufferError  # noqa: F401
from .window import Window  # noqa: F401
from .compose import Stage, compose, stream_scan  # noqa: F401
