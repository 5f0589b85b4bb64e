from .mss_loss import (mss_loss, multi_resolution_stft_loss, sdr, si_sdr,
                       si_sdr_loss, spectral_loss)
from .pit import (fixed_order_loss, mr_l1_tfd_loss, pairwise_si_snr_loss,
                  pit_loss, pit_si_snr_loss)

__all__ = [
    "mss_loss", "multi_resolution_stft_loss", "sdr", "si_sdr", "si_sdr_loss",
    "spectral_loss", "fixed_order_loss", "mr_l1_tfd_loss",
    "pairwise_si_snr_loss", "pit_loss", "pit_si_snr_loss",
]
