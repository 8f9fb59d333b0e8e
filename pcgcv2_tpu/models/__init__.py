from pcgcv2_tpu.models.autoencoder import Decoder, Encoder
from pcgcv2_tpu.models.entropy import EntropyBottleneck
from pcgcv2_tpu.models.pcc import PCCModel

__all__ = ["Decoder", "Encoder", "EntropyBottleneck", "PCCModel"]
