from xmc_gan_tpu.models import df_gan  # noqa: F401
