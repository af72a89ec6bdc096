from audio2photoreal_tpu.models.film_transformer import FiLMDenoiser
from audio2photoreal_tpu.models.guide import GuideTransformer
from audio2photoreal_tpu.models.vqvae import TemporalVertexCodec, VQState
from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor

__all__ = [
    "FiLMDenoiser",
    "GuideTransformer",
    "TemporalVertexCodec",
    "VQState",
    "Wav2VecFeatureExtractor",
]
