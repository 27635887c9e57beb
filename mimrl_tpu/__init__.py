"""mimrl_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Mutual-Information-based disentangled Multimodal Representation Learning.

Re-designed from scratch for TPU with the full capability surface of the
reference PyTorch codebase (kiva12138/MIMRL):

- CubeMLP axis-mixing fusion encoder            (ref: MLPProcess.py)
- BERT text extractor + GRU/LSTM/Conv A-V encoders (ref: Model.py:243-257)
- Variational MI estimator toolkit: separate/concat critics,
  constant/gaussian/unnormalized baselines, 9 lower bounds
  (dv, mine, tuba, nwj, infonce, js, js_fgan, smile, interpolate)
                                                (ref: VMI.py)
- Classifier-based conditional-MI estimation with on-device kNN
  conditional-product sampling                  (ref: Model.py:75-225)
- Two-stage alternating training (critics / main model) with dual
  optimizers, all LR schedules, checkpointing + true resume
                                                (ref: Solver.py)
- Dataset pipelines for CMU-MOSI/MOSEI/POM (SDK & DeclareLab pickle
  formats), AVEC2019, and the "local" dense datasets
                                                (ref: DataLoader*.py)

Everything in the compute path is jit-compiled with static shapes; data
parallelism is expressed with `jax.sharding` over a device mesh, and the
hot fusion kernel has a fused Pallas implementation.
"""

__version__ = "0.1.0"
