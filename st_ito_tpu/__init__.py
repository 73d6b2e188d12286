"""st_ito_tpu — TPU-native audio production style transfer with inference-time optimization.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of csteinmetz1/st-ito
(AES-155 "ST-ITO: Controlling audio effects for style transfer with
inference-time optimization").

Architecture (TPU-first, not a port):

- ``ops``      pure, vmappable DSP kernels (EQ/compressor/reverb/delay/...),
               LTI effects applied via frequency-sampling FFT instead of serial
               CPU plugin renders; exact lax.scan paths kept for parity tests.
- ``proc``     dasp-style differentiable processors on normalized [0,1] params
               (reference: st_ito/effects.py:515-780).
- ``chain``    declarative effect-chain executor: render(w[P], x[C,T]) as one
               traced XLA program (reference: st_ito/style_transfer.py:45-115).
- ``models``   AFx-Rep Cnn14 mid/side encoder in flax + torch-ckpt converter
               (reference: st_ito/models/panns.py, st_ito/utils.py:444-551).
- ``ito``      CMA-ES and gradient ITO engines; whole populations evaluated as
               one vmapped render+embed program, shardable over a device mesh
               (reference: st_ito/style_transfer.py:399-692).
- ``train``    pretext (ParameterEstimator) + style-transfer training systems
               as optax/pjit loops (reference: st_ito/methods/).
- ``parallel`` mesh construction and sharding helpers.
"""

__version__ = "0.1.0"
