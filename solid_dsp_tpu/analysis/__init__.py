"""Filter analysis: group delay, frequency response."""

from .group_delay import fir_group_delay, iir_group_delay  # noqa: F401
from .freq_response import fir_frequency_response, iir_frequency_response  # noqa: F401
