from .encoder_decoder import (EncoderDecoder3D, EncoderDecoder3DConfig,
                              encoder_decoder3d_loss,
                              encoder_decoder3d_predict, slide_inference,
                              slide_merge, sliding_patches)

__all__ = ['EncoderDecoder3D', 'EncoderDecoder3DConfig',
           'encoder_decoder3d_loss', 'encoder_decoder3d_predict',
           'slide_inference', 'slide_merge', 'sliding_patches']
