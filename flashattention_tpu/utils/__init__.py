from flashattention_tpu.utils import benchit, testing
