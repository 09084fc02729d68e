"""Snowball string-machine runtime (org/tartarus/snowball/
SnowballProgram.java rev 502 + Among.java), the execution substrate
for the generated stemmer classes in snowball_ext.py.

State: ``current`` (a Python list of chars), ``cursor``, ``limit``,
``limit_backward``, ``bra``, ``ket`` — exactly the Java fields. The
among tables are (string, substring_i, result, method_name) tuples;
find_among/find_among_b keep the reference's bisection walk verbatim
(SnowballProgram.java:263-400), including the conditional-method
re-dispatch with cursor reset.

Labeled break/continue in the generated code arrive as the _Br/_Ct
exceptions the transpiler emits — bound to the innermost breakable
construct, which is Java's binding rule."""

from __future__ import annotations


class _Br(Exception):
    __slots__ = ("lab",)

    def __init__(self, lab):
        self.lab = lab


class _Ct(Exception):
    __slots__ = ("lab",)

    def __init__(self, lab):
        self.lab = lab


class SnowballProgram:
    def __init__(self):
        self.set_current("")

    def set_current(self, value: str) -> None:
        self.current = list(value)
        self.cursor = 0
        self.limit = len(value)
        self.limit_backward = 0
        self.bra = self.cursor
        self.ket = self.limit

    def get_current(self) -> str:
        return "".join(self.current[:self.limit])

    # -- groupings (bit sets over char codes) --
    def in_grouping(self, s, mn, mx) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if ch > mx or ch < mn:
            return False
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 7))) == 0:
            return False
        self.cursor += 1
        return True

    def in_grouping_b(self, s, mn, mx) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if ch > mx or ch < mn:
            return False
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 7))) == 0:
            return False
        self.cursor -= 1
        return True

    def out_grouping(self, s, mn, mx) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if ch > mx or ch < mn:
            self.cursor += 1
            return True
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 7))) == 0:
            self.cursor += 1
            return True
        return False

    def out_grouping_b(self, s, mn, mx) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if ch > mx or ch < mn:
            self.cursor -= 1
            return True
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 7))) == 0:
            self.cursor -= 1
            return True
        return False

    def in_range(self, mn, mx) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if ch > mx or ch < mn:
            return False
        self.cursor += 1
        return True

    def in_range_b(self, mn, mx) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if ch > mx or ch < mn:
            return False
        self.cursor -= 1
        return True

    def out_range(self, mn, mx) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if not (ch > mx or ch < mn):
            return False
        self.cursor += 1
        return True

    def out_range_b(self, mn, mx) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if not (ch > mx or ch < mn):
            return False
        self.cursor -= 1
        return True

    # -- literal matches --
    def eq_s(self, s_size, s) -> bool:
        if isinstance(s_size, str):      # eq_v form
            s_size, s = len(s_size), s_size
        if self.limit - self.cursor < s_size:
            return False
        for i in range(s_size):
            if self.current[self.cursor + i] != s[i]:
                return False
        self.cursor += s_size
        return True

    def eq_s_b(self, s_size, s) -> bool:
        if isinstance(s_size, str):
            s_size, s = len(s_size), s_size
        if self.cursor - self.limit_backward < s_size:
            return False
        for i in range(s_size):
            if self.current[self.cursor - s_size + i] != s[i]:
                return False
        self.cursor -= s_size
        return True

    def eq_v(self, s) -> bool:
        return self.eq_s(len(s), s)

    def eq_v_b(self, s) -> bool:
        return self.eq_s_b(len(s), s)

    # -- among search (verbatim bisection, :263-400) --
    def find_among(self, v) -> int:
        i = 0
        j = len(v)
        c = self.cursor
        l = self.limit
        common_i = 0
        common_j = 0
        first_key_inspected = False
        cur = self.current
        while True:
            k = i + ((j - i) >> 1)
            diff = 0
            common = common_i if common_i < common_j else common_j
            w = v[k]
            ws = w[0]
            for i2 in range(common, len(ws)):
                if c + common == l:
                    diff = -1
                    break
                diff = ord(cur[c + common]) - ord(ws[i2])
                if diff != 0:
                    break
                common += 1
            if diff < 0:
                j = k
                common_j = common
            else:
                i = k
                common_i = common
            if j - i <= 1:
                if i > 0:
                    break
                if j == i:
                    break
                if first_key_inspected:
                    break
                first_key_inspected = True
        while True:
            w = v[i]
            if common_i >= len(w[0]):
                self.cursor = c + len(w[0])
                if w[3] is None:
                    return w[2]
                res = getattr(self, w[3])()
                self.cursor = c + len(w[0])
                if res:
                    return w[2]
            i = w[1]
            if i < 0:
                return 0

    def find_among_b(self, v) -> int:
        i = 0
        j = len(v)
        c = self.cursor
        lb = self.limit_backward
        common_i = 0
        common_j = 0
        first_key_inspected = False
        cur = self.current
        while True:
            k = i + ((j - i) >> 1)
            diff = 0
            common = common_i if common_i < common_j else common_j
            w = v[k]
            ws = w[0]
            for i2 in range(len(ws) - 1 - common, -1, -1):
                if c - common == lb:
                    diff = -1
                    break
                diff = ord(cur[c - 1 - common]) - ord(ws[i2])
                if diff != 0:
                    break
                common += 1
            if diff < 0:
                j = k
                common_j = common
            else:
                i = k
                common_i = common
            if j - i <= 1:
                if i > 0:
                    break
                if j == i:
                    break
                if first_key_inspected:
                    break
                first_key_inspected = True
        while True:
            w = v[i]
            if common_i >= len(w[0]):
                self.cursor = c - len(w[0])
                if w[3] is None:
                    return w[2]
                res = getattr(self, w[3])()
                self.cursor = c - len(w[0])
                if res:
                    return w[2]
            i = w[1]
            if i < 0:
                return 0

    # -- slicing --
    def replace_s(self, c_bra, c_ket, s) -> int:
        adjustment = len(s) - (c_ket - c_bra)
        self.current[c_bra:c_ket] = list(s)
        self.limit += adjustment
        if self.cursor >= c_ket:
            self.cursor += adjustment
        elif self.cursor > c_bra:
            self.cursor = c_bra
        return adjustment

    def slice_check(self) -> None:
        if self.bra < 0 or self.bra > self.ket or self.ket > self.limit:
            raise ValueError(
                f"faulty slice operation: bra={self.bra},"
                f"ket={self.ket},limit={self.limit}")

    def slice_from(self, s) -> None:
        self.slice_check()
        self.replace_s(self.bra, self.ket, s)

    def slice_del(self) -> None:
        self.slice_from("")

    def insert(self, c_bra, c_ket, s) -> None:
        adjustment = self.replace_s(c_bra, c_ket, s)
        if c_bra <= self.bra:
            self.bra += adjustment
        if c_bra <= self.ket:
            self.ket += adjustment

    def slice_to(self, _s=None) -> str:
        self.slice_check()
        return "".join(self.current[self.bra:self.ket])

    def assign_to(self, _s=None) -> str:
        return "".join(self.current[:self.limit])
