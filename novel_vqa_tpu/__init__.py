"""novel_vqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the CVPR-2017 `novel-vqa` reference pipeline.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

- ``core``      config dataclasses + CLI bridge, PRNG seeding, artifact I/O
                (byte-identical h5/json schemas), checkpoint formats.
- ``ops``       compute kernels: fused LSTM step (XLA + Pallas variants),
                embedding, L2-normalize, masked sequence NLL, cross-entropy,
                AxB/AskipB/A_B fusion blocks, reference-exact optimizers.
- ``data``      HDF5-backed loaders: sequential-with-wrap corpus loader,
                random-with-replacement VQA batcher, right-align + masking,
                host->device prefetch.
- ``models``    vqa (arch1 late-fusion, arch2 encoder-init), seq (text /
                weak-paired autoencoders), vision (VGG-16/19, Inception-v3).
- ``parallel``  device-mesh creation and data-parallel pjit/shard_map train
                steps (the reference is single-GPU; DP-over-ICI is the
                TPU-native scaling plan, SURVEY.md section 2.8).
- ``train``     CLI training/eval drivers mirroring the reference's numbered
                pipeline scripts.
- ``pipeline``  dataset creation / corpus + VQA preprocessing / dataset
                correction stages (Python-3 ports with seeded determinism).
- ``eval``      bit-exact port of the official VQA evaluation (vqaTools/vqaEval).
"""

__version__ = "0.1.0"
