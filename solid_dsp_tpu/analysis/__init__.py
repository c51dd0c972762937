"""Filter analysis: group delay, frequency response, spectral estimation."""

from .spectral import (  # noqa: F401
    frame_signal,
    stft,
    spectrogram,
    welch_psd,
    goertzel_bank,
    csd,
    coherence,
    cepstrum,
    analytic_signal,
    envelope,
    instantaneous_frequency,
)

from .snr import snr_m2m4, evm, noise_floor, tone_snr  # noqa: F401
from .cyclo import (  # noqa: F401
    cyclic_spectrum, cycle_profile, detect_cyclic_features,
    estimate_symbol_rate)
from .estimate import (  # noqa: F401
    tone_freq_kay, tone_freq_fft, tone_phase, tone_amplitude,
    tdoa_gcc_phat)
from .lpc import (  # noqa: F401
    acf, levinson, lpc, burg, ar_psd, lattice_fir, lattice_iir,
    reflection_to_poly)

from .group_delay import fir_group_delay, iir_group_delay, fir_group_delay_band  # noqa: F401
from .freq_response import (  # noqa: F401
    fir_frequency_response,
    iir_frequency_response,
    frequency_response_band,
    iir_frequency_response_band,
)

from .measurements import (  # noqa: F401
    channel_power, acpr, occupied_bandwidth, papr_ccdf, sinad_db, enob,
    sfdr_db)
