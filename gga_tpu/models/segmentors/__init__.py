from .encoder_decoder import (EncoderDecoder3D, EncoderDecoder3DConfig,
                              segmentation_loss)

__all__ = ['EncoderDecoder3D', 'EncoderDecoder3DConfig',
           'segmentation_loss']
