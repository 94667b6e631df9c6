"""TPU-native text-to-image GAN framework (XMC-GAN / DF-GAN family) in JAX.

Public entry points:

* ``xmc_gan_tpu.config.cfg_from_file`` — load a reference-schema YAML config
* ``xmc_gan_tpu.train`` — ``create_train_state`` / ``make_train_step``
* ``xmc_gan_tpu.trainer.Trainer`` — full training orchestration
* ``xmc_gan_tpu.eval`` — sampling + FID
* ``python -m xmc_gan_tpu.cli`` — train / eval / sample CLI
"""

__version__ = "0.1.0"
