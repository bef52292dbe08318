from .schedule import NoiseSchedule, cosine_beta_schedule, q_sample
from .sampler import ddpm_sample, ddim_sample, respaced_timesteps
