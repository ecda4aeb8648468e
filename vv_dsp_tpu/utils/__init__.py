from vv_dsp_tpu.utils.nan_policy import NanPolicy, apply_nan_policy, has_nan_or_inf
