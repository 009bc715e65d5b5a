from gltvae.parallel.mesh import (create_mesh, batch_sharding,
                                  replicated_sharding, initialize_multihost)
from gltvae.parallel.dp import (make_parallel_train_steps, shard_state,
                                shard_batch, make_parallel_eval_step)
