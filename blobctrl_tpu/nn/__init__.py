from blobctrl_tpu.nn import layers, embeddings, attention, transformer_2d, resnet, unet_blocks
