from gltvae.models.networks import (
    Encoder,
    Decoder,
    GatedClassifier,
    ConditionalPrior,
    TFConvTranspose,
)
from gltvae.models.ccvae import CCVAE, Temps, LossAux
