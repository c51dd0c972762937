"""Model families: modulators/demodulators, receive chains, channelizers.

The reference declared-but-never-implemented a modulation layer
(src/modulation/mod.rs is an empty stub, SURVEY §2 #33); the driver's target
chain (BASELINE.json config 4) requires FM + QPSK + AM demodulation.  This
package provides them as pure block transforms plus the flagship composed
``RxChain``.
"""

from . import am, fm, qpsk  # noqa: F401
from .rx_chain import RxChain, RxChainConfig  # noqa: F401
from .channelizer import PolyphaseChannelizer, OversampledChannelizer  # noqa: F401
from .channel_bank import ChannelBank  # noqa: F401
from . import timing, equalizer, fsk, ofdm, linear_mod, detect, impairments, ddc, tx_chain, fec, channel, framesync, packet, ldpc, rs, gmsk, dsss, ofdm_pilots, array_proc, dpd, cfr, polar, radar, adsb, ais, modclass, pocsag, rds, turbo, cvsd, mimo, ccsds, css, fhss, ofdm_link, monitor, cw, dtmf, sounder, block_codes  # noqa: F401
from .block_codes import BlockCode  # noqa: F401
from . import ber  # noqa: F401
from .ber import ber_sweep, link_sim  # noqa: F401
from .ldpc import LDPCCode  # noqa: F401
from .turbo import TurboCode  # noqa: F401
from .packet import PacketModem  # noqa: F401
from .ofdm_link import OFDMModem  # noqa: F401
from .linear_mod import LinearModem  # noqa: F401
from .tx_chain import TxChain, TxChainConfig  # noqa: F401
