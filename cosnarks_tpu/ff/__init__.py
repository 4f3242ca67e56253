from . import bigint, mont, spec
from .spec import BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR, Field
