from gltvae.ops.pallas.preprocess import (normalize_images,
                                          preprocess_batch)
