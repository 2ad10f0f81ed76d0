from fcl_taco2_tpu.vocoder.pwg import (PWGConfig, import_pwg_state_dict,  # noqa: F401
                                       pwg_generate, pwg_init)
