from .logging import TLOG, WLOG, ELOG
