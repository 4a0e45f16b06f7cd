from pseudocylindrical_convolution_tpu.models.transform import (
    encoder_init, encoder_apply, decoder_init, decoder_apply)
from pseudocylindrical_convolution_tpu.models.entropy import (
    entropy_net_init, entropy_net_apply, entropy_net_raw)
from pseudocylindrical_convolution_tpu.models.cmpnet import (
    cmpnet_init, cmpnet_apply, CMPNetConfig)
