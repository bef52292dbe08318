from . import config, dtypes, prng
