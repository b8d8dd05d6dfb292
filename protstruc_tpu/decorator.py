"""Drop-in alias for the reference's ``protstruc.decorator`` module.

The reference's ``with_tensor`` converts NumPy args to torch and echoes
NumPy back iff no input was a tensor (decorator.py:5-53).  The JAX analogue
(`compat.with_array`) has the same contract with jnp arrays; exported here
under the reference name for drop-in ports.
"""

from protstruc_tpu.compat import with_array

with_tensor = with_array

__all__ = ["with_tensor", "with_array"]
