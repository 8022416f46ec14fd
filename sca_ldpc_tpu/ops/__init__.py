from .binary_bp import BinaryBPDecoder
from .circulant_bp import CirculantBPDecoder
from .qary import QaryDecoder
from .qary_special import QarySpecialDecoder

__all__ = ["BinaryBPDecoder", "CirculantBPDecoder", "QaryDecoder", "QarySpecialDecoder"]
