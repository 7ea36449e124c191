from rodeo_tpu.prior.ibm import ibm_init, ibm_state
from rodeo_tpu.prior.indep_init import indep_init
