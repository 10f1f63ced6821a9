from .pipe import ConvOp, ConvNode, ConvPipe
from .support import SupportInfo, in_box_to_out_box, unchecked_out_box_to_in_box
