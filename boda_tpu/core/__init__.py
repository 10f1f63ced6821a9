from .error import RtErr, rt_err
from .dims import Dim, Dims, NDA
from .lexp import Lexp, parse_lexp, lexp_escape, str_format_from_nvm
from .timers import timer, timer_log, global_timer_log_finalize
from .digest import nda_digest, Digest
