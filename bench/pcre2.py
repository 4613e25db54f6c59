"""ctypes driver for the system PCRE2 library (libpcre2-8), giving
bench/compare.py the external-engine rows the reference bench has
(/root/reference/bench/bench:6-13 compares sregex against pcre,
pcre-jit, and pcre-dfa; re1 and RE2 are not present on this image, so
those rows stay absent and are documented in docs/PERFORMANCE.md).

Measures the same quantity as the reference bench harness
(bench/sregex.c:224-252): wall time of one whole-buffer first-match
call."""

import ctypes
import ctypes.util

PCRE2_JIT_COMPLETE = 0x00000001
PCRE2_ERROR_NOMATCH = -1

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    name = ctypes.util.find_library("pcre2-8")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.pcre2_compile_8.restype = ctypes.c_void_p
    lib.pcre2_compile_8.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p]
    lib.pcre2_match_data_create_from_pattern_8.restype = ctypes.c_void_p
    lib.pcre2_match_data_create_from_pattern_8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p]
    lib.pcre2_match_8.restype = ctypes.c_int
    lib.pcre2_match_8.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_uint32, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.pcre2_dfa_match_8.restype = ctypes.c_int
    lib.pcre2_dfa_match_8.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_uint32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_size_t]
    lib.pcre2_jit_compile_8.restype = ctypes.c_int
    lib.pcre2_jit_compile_8.argtypes = [ctypes.c_void_p,
                                        ctypes.c_uint32]
    lib.pcre2_get_ovector_pointer_8.restype = \
        ctypes.POINTER(ctypes.c_size_t)
    lib.pcre2_get_ovector_pointer_8.argtypes = [ctypes.c_void_p]
    lib.pcre2_match_context_create_8.restype = ctypes.c_void_p
    lib.pcre2_match_context_create_8.argtypes = [ctypes.c_void_p]
    lib.pcre2_set_match_limit_8.restype = ctypes.c_int
    lib.pcre2_set_match_limit_8.argtypes = [ctypes.c_void_p,
                                            ctypes.c_uint32]
    _lib = lib
    return _lib


class Pcre2:
    """One compiled PCRE2 pattern with match/dfa_match entry points."""

    def __init__(self, pattern, jit=False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libpcre2-8 not available")
        self.lib = lib
        if isinstance(pattern, str):
            pattern = pattern.encode()
        err = ctypes.c_int(0)
        erroff = ctypes.c_size_t(0)
        self.code = lib.pcre2_compile_8(pattern, len(pattern), 0,
                                        ctypes.byref(err),
                                        ctypes.byref(erroff), None)
        if not self.code:
            raise ValueError("pcre2_compile failed (err %d at %d)"
                             % (err.value, erroff.value))
        if jit:
            rc = lib.pcre2_jit_compile_8(self.code, PCRE2_JIT_COMPLETE)
            if rc != 0:
                raise RuntimeError("pcre2_jit_compile failed: %d" % rc)
        self.md = lib.pcre2_match_data_create_from_pattern_8(self.code,
                                                             None)
        self._ws = (ctypes.c_int * 16384)()
        # the DFA engine counts internal "matches" against the match
        # limit; whole-buffer scans over tens of MB need it raised
        self.mctx = lib.pcre2_match_context_create_8(None)
        lib.pcre2_set_match_limit_8(self.mctx, 0xFFFFFFFF)

    def match(self, subject):
        """First match: (start, end) or None."""
        rc = self.lib.pcre2_match_8(self.code, subject, len(subject),
                                    0, 0, self.md, self.mctx)
        if rc == PCRE2_ERROR_NOMATCH:
            return None
        if rc < 0:
            raise RuntimeError("pcre2_match error %d" % rc)
        ov = self.lib.pcre2_get_ovector_pointer_8(self.md)
        return int(ov[0]), int(ov[1])

    def dfa_match(self, subject):
        """First match end via the DFA engine: (start, end) or None."""
        rc = self.lib.pcre2_dfa_match_8(self.code, subject,
                                        len(subject), 0, 0, self.md,
                                        self.mctx, self._ws, 16384)
        if rc == PCRE2_ERROR_NOMATCH:
            return None
        if rc < 0:
            raise RuntimeError("pcre2_dfa_match error %d" % rc)
        ov = self.lib.pcre2_get_ovector_pointer_8(self.md)
        return int(ov[0]), int(ov[1])
