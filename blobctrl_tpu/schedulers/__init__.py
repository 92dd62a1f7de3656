from blobctrl_tpu.schedulers import ddim, unipc
