"""DTPD — the datetime-pattern table, as data.

The PySpark re-expression of the reference's ``DATETIME_PARSE_DATAS``
(/root/reference/src/data/datetime.rs:2575-5244; 173 entries, struct at
:988-1019). The reference's entries differ mostly by timezone form and
bracket style; per its own TODO (datetime.rs:2568-2574) we collapse those
variants with optional regex groups, giving ~24 ordered patterns that cover
every format family:

* samba/xrdp bracketed Y/m/d           (datetime.rs:2577-2652)
* opentftp ``[dd-Mon-yy]``             (datetime.rs:2654-2677)
* RFC 3339 / 5424 syslog ±pri          (datetime.rs:2679-2888)
* RFC 3164 no-year syslog              (datetime.rs:2793+)
* Windows ``MM/DD/YY``                 (datetime.rs:2920-3020)
* RFC 2822                             (datetime.rs:3306-3373)
* Apache/nginx CLF                     (datetime.rs:3452-3465)
* synology tab format                  (datetime.rs:3653)
* Red Hat Audit epoch                  (datetime.rs:4289)
* strace epoch                         (datetime.rs:4306-4352)
* general anchored / unanchored        (datetime.rs:3899, :4590)

Each entry embeds test cases exactly like the reference's
``DateTimeParseInstr._test_cases`` (datetime.rs:1013-1015): they are run
by ``tests/test_patterns.py`` as a parametrized matrix, mirroring
``test_DATETIME_PARSE_DATAS`` (src/tests/datetime_tests.rs:261,297).

Semantics preserved on purpose (quirks included):

* table ORDER is the dispatch order; first match wins
  (datetime.rs:2517-2556);
* patterns without a year fill the reference's dummy year **1972**
  (datetime.rs:146-155) unless a reference year is supplied — year
  inference then runs as a separate operator (operators/yearfix.py);
* patterns without a tz get the job's default offset (``--tz-offset``);
* fractional seconds are right-padded to 9 digits; Spark timestamps are
  µs so the ns remainder is carried in a separate ``ts_ns`` column;
* 2-digit years pivot like chrono ``%y``: 00-68 → 20xx, 69-99 → 19xx;
* per-pattern byte-range slice (``range_regex``, datetime.rs:995-1008)
  becomes a character slice applied before regex.

Test-case expected values are given as ``(dt_beg, dt_end, iso_utc_us,
ns_rem)`` with dt offsets in characters (the corpus is single-byte-ish but
the engine is char-oriented; the reference is byte-oriented).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# component fragments (named groups; one use per regex)
# ---------------------------------------------------------------------------
YEAR = r"(?P<year>[12]\d{3})"
YEAR2 = r"(?P<year2>\d{2})"
MONTHm = r"(?P<month>\d{1,2})"
MONTHb = r"(?P<monthb>[A-Za-z]{3,9})"
DAY = r"(?P<day>\d{1,2})"
DAYe = r"(?P<day> ?\d{1,2})"  # %e: space-padded day ('Jan  1')
HOUR = r"(?P<hour>\d{1,2})"
MIN = r"(?P<minute>\d{2})"
SEC = r"(?P<second>\d{2})"
FRAC = r"(?P<frac>\d{1,9})"
# all numeric tz forms in one group: -0800 | -08:00 | -08 | Z
TZNUM = r"(?P<tz>[+-]\d{2}:?(?:\d{2})?|Z)"
TZNAME = r"(?P<tzname>[A-Za-z][A-Za-z/_]{1,9})"
PRI = r"<\d{1,3}>"  # RFC 3164/5424 priority; max 191 (rsyslog LOG_MAXPRI)
LB = r"[\[\(\{<]"  # left bracket family accepted by the reference
RB = r"[\]\)\}>]"
MON3 = "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"


@dataclass(frozen=True)
class DTPD:
    """One datetime-parse instruction (≙ reference DateTimeParseInstr)."""

    name: str
    regex: str  # must contain named group 'dt' spanning the datetime text
    slice_lo: int = 0
    slice_hi: int = 64
    has_year: bool = True  # False → dummy-year fill + year-inference eligible
    epoch: bool = False  # 'epoch' group = seconds (+ optional 'frac')
    mjd: bool = False  # 'mjd' + 'sod_i'/'sod_f' groups (NTP statistics)
    # cheap rejection before the full regex (≙ ezcheck, reference
    # syslinereader.rs:1077-1187): a LITERAL the line must contain (memchr
    # -fast via pandas str.contains(regex=False)), or a tiny regex when
    # prefilter_regex=True. Mostly valuable for UNANCHORED patterns whose
    # full regex would otherwise scan every byte of every line.
    prefilter: str | None = None
    prefilter_regex: bool = False
    # embedded test cases: (line, dt_beg, dt_end, iso_utc_microseconds, ns_rem)
    # expected values assume default tz +00:00 and default year 1972
    test_cases: tuple = field(default_factory=tuple)


# ---------------------------------------------------------------------------
# the table — ORDER IS SEMANTICS (first match wins)
# ---------------------------------------------------------------------------
DATETIME_PARSE_DATAS: list[DTPD] = [
    # -- samba/xrdp bracketed Y/m/d, tz variants collapsed (datetime.rs:2577-2652)
    DTPD(
        name="bracketed_ymd_named_tz",
        regex=rf"^{LB}(?P<dt>{YEAR}[/\-]{MONTHm}[/\-]{DAY}[ T\-]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?{TZNAME}){RB}",
        slice_lo=0,
        slice_hi=48,
        test_cases=(
            ("<2000/01/01 00:00:05.123456789 PST> ../source3/smbd/oplock.c:1340(init_oplocks)", 1, 34, "2000-01-01T08:00:05.123456", 789),
            ("<2000/01/01 00:00:05.123456789pst> ../source3/smbd/oplock.c", 1, 33, "2000-01-01T08:00:05.123456", 789),
            ("(2000/01/01 00:00:05.123456789 VLAT) x", 1, 35, "1999-12-31T14:00:05.123456", 789),
        ),
    ),
    DTPD(
        name="bracketed_ymd_num_tz",
        regex=rf"^{LB}(?P<dt>{YEAR}[/\-]{MONTHm}[/\-]{DAY}[ T\-]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?{TZNUM}){RB}",
        slice_lo=0,
        slice_hi=48,
        test_cases=(
            ("(2000/01/01 00:00:02.123 -1100) ../source3/smbd/oplock.c:1340(init_oplocks)", 1, 30, "2000-01-01T11:00:02.123000", 0),
            ("{2000/01/01 00:00:03.123456789 -11:30} x", 1, 37, "2000-01-01T11:30:03.123456", 789),
            ("(2000/01/01 00:00:04.123456789 -11)", 1, 34, "2000-01-01T11:00:04.123456", 789),
        ),
    ),
    DTPD(
        name="bracketed_ymd",
        regex=rf"^{LB}(?P<dt>{YEAR}[/\-]{MONTHm}[/\-]{DAY}[ T\-]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)(?:[,\.\| \t][^\]\)\}}>]{{0,20}})?{RB}",
        slice_lo=0,
        slice_hi=48,
        test_cases=(
            ("[2000/01/01 00:00:01.123] ../source3/smbd/oplock.c:1340(init_oplocks)", 1, 24, "2000-01-01T00:00:01.123000", 0),
            ("[2000/01/01 00:00:01.123456789] x", 1, 30, "2000-01-01T00:00:01.123456", 789),
            ("[2020/03/05 12:17:59.631000,  3] ../source3/smbd/oplock.c:1340(init_oplocks)", 1, 27, "2020-03-05T12:17:59.631000", 0),
            ("[2020-01-13-11:03:06] [DEBUG] Closed socket 7", 1, 20, "2020-01-13T11:03:06.000000", 0),
        ),
    ),
    # -- compact xrdp [20200113-11:03:06] (datetime.rs:2577 xrdp.log comment)
    DTPD(
        name="bracketed_compact_ymd",
        regex=rf"^{LB}(?P<dt>{YEAR}{MONTHm}{DAY}-{HOUR}:{MIN}:{SEC}){RB}",
        slice_lo=0,
        slice_hi=24,
        test_cases=(("[20200113-11:03:06] [DEBUG] Closed socket 7 (AF_INET6 :: port 3389)", 1, 18, "2020-01-13T11:03:06.000000", 0),),
    ),
    # -- opentftp [22-Feb-17 21:24:20] (datetime.rs:2654-2677)
    DTPD(
        name="bracketed_dby",
        regex=rf"^{LB}(?P<dt>{DAY}-{MONTHb}-{YEAR2} {HOUR}:{MIN}:{SEC}){RB}",
        slice_lo=0,
        slice_hi=24,
        test_cases=(("[22-Feb-17 21:24:20] Section [ALLOWED-CLIENTS] Invalid entry", 1, 19, "2017-02-22T21:24:20.000000", 0),),
    ),
    # -- RFC 3339/5424 syslog, optional <pri>, tz variants (datetime.rs:2679-2888)
    DTPD(
        name="rfc3339_num_tz",
        regex=rf"^(?:{PRI} ?)?(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?{TZNUM})(?:\d)?",
        slice_lo=0,
        slice_hi=56,
        test_cases=(
            ("<31>2023-01-06T14:35:00.506282-08:00 (host) (192.168.0.1) [unbound[63893] daemon:debug]", 4, 36, "2023-01-06T22:35:00.506282", 0),
            ("<31>2023-01-06T14:35:00.506282+0800 (host)", 4, 35, "2023-01-06T06:35:00.506282", 0),
            ("2023-01-06T14:35:00.506282871 +0800 host", 0, 35, "2023-01-06T06:35:00.506282", 871),
            ("2020-01-01T00:00:00Z start", 0, 20, "2020-01-01T00:00:00.000000", 0),
            ("2023-06-15 10:20:30.5 -07:00 done", 0, 28, "2023-06-15T17:20:30.500000", 0),
        ),
    ),
    DTPD(
        name="rfc3339_named_tz",
        regex=rf"^(?:{PRI} ?)?(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? {TZNAME})(?:[ :\[]|$)",
        slice_lo=0,
        slice_hi=56,
        test_cases=(
            ("2023-01-06 14:35:00.506 PST host app: msg", 0, 27, "2023-01-06T22:35:00.506000", 0),
            ("2023-01-06 14:35:00 UTC host", 0, 23, "2023-01-06T14:35:00.000000", 0),
        ),
    ),
    DTPD(
        name="rfc3339",
        regex=rf"^(?:{PRI} ?)?(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=56,
        test_cases=(
            ("2020-01-01 00:20:00.000001 a message", 0, 26, "2020-01-01T00:20:00.000001", 0),
            ("<29>2023-01-01 14:21:13 HOST netifd: Network device 'eth0' link is up", 4, 23, "2023-01-01T14:21:13.000000", 0),
            ("2020-06-06 07:37:07,depth,1 INFO", 0, 19, "2020-06-06T07:37:07.000000", 0),
        ),
    ),
    # -- synology/word-prefix tab format (datetime.rs:3653): dt after one token + tab
    DTPD(
        name="word_tab_ymd",
        regex=rf"^[\w\-\.]{{1,16}}\t(?P<dt>{YEAR}[/\-]{MONTHm}[/\-]{DAY}[ T]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=48,
        test_cases=(("info\t2018/02/24 02:30:04\tSYSTEM:\t[Local]UPS was plugged in.", 5, 24, "2018-02-24T02:30:04.000000", 0),),
    ),
    # -- RFC 2822: Wed, 1 Jan 2020 22:00:00 PST (datetime.rs:3306-3373)
    DTPD(
        name="rfc2822_named_tz",
        regex=rf"^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,? (?P<dt>{DAYe} {MONTHb} {YEAR} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? {TZNAME})(?:[ :]|$)",
        slice_lo=0,
        slice_hi=48,
        test_cases=(("Wed, 1 Jan 2020 22:00:00 PST message", 5, 28, "2020-01-02T06:00:00.000000", 0),),
    ),
    DTPD(
        name="rfc2822_num_tz",
        regex=rf"^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,? (?P<dt>{DAYe} {MONTHb} {YEAR} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?{TZNUM})",
        slice_lo=0,
        slice_hi=48,
        test_cases=(("Tue, 03 May 2022 01:02:03 +0200 body", 5, 31, "2022-05-02T23:02:03.000000", 0),),
    ),
    DTPD(
        name="rfc2822",
        regex=rf"^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,? (?P<dt>{DAYe} {MONTHb} {YEAR} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=48,
        test_cases=(("Wed 1 Jan 2020 22:00:00 message", 4, 23, "2020-01-01T22:00:00.000000", 0),),
    ),
    # -- 'Mon DD YYYY HH:MM:SS' / dmesg-with-year family (datetime.rs:3899 region)
    DTPD(
        name="bdy_hms",
        regex=rf"^(?:(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,? )?(?P<dt>{MONTHb} {DAYe},? {YEAR} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?(?: ?{TZNUM})?)",
        slice_lo=0,
        slice_hi=48,
        test_cases=(
            ("January 01 2020 22:00:00 host app: msg", 0, 24, "2020-01-01T22:00:00.000000", 0),
            ("Tue, Jun 28 2022 01:51:12 +0000", 5, 31, "2022-06-28T01:51:12.000000", 0),
            ("Tue, Jun 28 2022 01:51:12 -0700", 5, 31, "2022-06-28T08:51:12.000000", 0),
        ),
    ),
    # -- RFC 3164 syslog, no year, optional <pri> (datetime.rs:2793+; year logic
    #    /root/reference/src/readers/syslogprocessor.rs:604)
    DTPD(
        name="rfc3164_noyear",
        regex=rf"^(?:{PRI} ?)?(?P<dt>{MONTHb} {DAYe} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)(?: |$)",
        slice_lo=0,
        slice_hi=40,
        has_year=False,
        test_cases=(
            ("<14>Jan  1 15:00:36 HOST dropbear[23732]: Exit (root): Disconnect received", 4, 19, "1972-01-01T15:00:36.000000", 0),
            ("Dec 31 23:59:59 host kernel: wrap", 0, 15, "1972-12-31T23:59:59.000000", 0),
            ("Jan  1 00:00:00 host kernel: wrapped", 0, 15, "1972-01-01T00:00:00.000000", 0),
        ),
    ),
    # -- Windows MM/DD/YY (datetime.rs:2920-3020; README.md:1028-1032)
    DTPD(
        name="windows_mdy",
        regex=rf"^(?P<dt>{MONTHm}/{DAY}/{YEAR2} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)[: ]",
        slice_lo=0,
        slice_hi=32,
        test_cases=(("11/01/19 20:03:40: infinst: Installed file C:\\WINDOWS\\inf\\oem2.inf", 0, 17, "2019-11-01T20:03:40.000000", 0),),
    ),
    # -- Red Hat Audit type=... msg=audit(EPOCH.frac:id) (datetime.rs:4289)
    DTPD(
        name="redhat_audit",
        regex=r"^type=[A-Z_]+ msg=audit\((?P<dt>(?P<epoch>\d{9,11})\.(?P<frac>\d{1,9})):\d+\)",
        slice_lo=0,
        slice_hi=80,
        prefilter="audit(",
        epoch=True,
        test_cases=(("type=USER_LOGIN msg=audit(1609459200.123:456): pid=1337", 26, 40, "2021-01-01T00:00:00.123000", 0),),
    ),
    # -- strace/epoch-at-start with fraction (datetime.rs:4306-4352)
    DTPD(
        name="epoch_frac",
        regex=r"^(?P<dt>(?P<epoch>\d{9,11})\.(?P<frac>\d{1,9}))(?:\s)",
        slice_lo=0,
        slice_hi=24,
        epoch=True,
        test_cases=(("1609459200.000123 read(3, \"...\", 1024) = 512", 0, 17, "2021-01-01T00:00:00.000123", 0),),
    ),
    # -- bare epoch seconds at start
    DTPD(
        name="epoch",
        regex=r"^(?P<dt>(?P<epoch>\d{9,11}))(?:\s)",
        slice_lo=0,
        slice_hi=16,
        epoch=True,
        test_cases=(("1609459200 boot event", 0, 10, "2021-01-01T00:00:00.000000", 0),),
    ),
    # -- Apache/nginx CLF: dt mid-line in [..] (datetime.rs:3452-3465; README.md:858)
    DTPD(
        name="apache_clf",
        regex=rf"\[(?P<dt>{DAY}/{MONTHb}/{YEAR}:{HOUR}:{MIN}:{SEC} ?{TZNUM})\]",
        slice_lo=0,
        slice_hi=96,
        prefilter="/",
        test_cases=(
            ('192.168.0.115 - - [08/Oct/2022:22:26:35 +0000] "GET / HTTP/1.1" 404 0 "-"', 19, 45, "2022-10-08T22:26:35.000000", 0),
        ),
    ),
    # -- apt history / unattended-upgrades dpkg log: 'Start-Date: Y-m-d  H:M:S'
    #    with DOUBLE space (datetime.rs:3374-3390, :2890-2905)
    DTPD(
        name="startdate_ymd",
        regex=rf"^(?:Log (?:started|ended)|(?:Start|End|START|END)[- ]?(?:Date|date|DATE)):?\s{{1,2}}(?P<dt>{YEAR}-{MONTHm}-{DAY}\s{{1,2}}{HOUR}:{MIN}:{SEC})",
        slice_lo=0,
        slice_hi=48,
        test_cases=(
            ("Start-Date: 2022-07-18  19:34:46", 12, 32, "2022-07-18T19:34:46.000000", 0),
            ("End-Date: 2022-07-18  19:35:04", 10, 30, "2022-07-18T19:35:04.000000", 0),
            ("Log started: 2022-07-14  06:48:58", 13, 33, "2022-07-14T06:48:58.000000", 0),
        ),
    ),
    # -- tomcat catalina.out: 'dd-MMM-yyyy H:M:S.fff' (datetime.rs:3610-3625)
    DTPD(
        name="tomcat_dby",
        regex=rf"^(?P<dt>{DAY}-{MONTHb}-{YEAR} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=32,
        test_cases=(
            ("08-Feb-2023 12:12:09.827 INFO [main] org.apache.coyote.AbstractProtocol.init", 0, 24, "2023-02-08T12:12:09.827000", 0),
        ),
    ),
    # -- ctime/asctime: 'Sat Oct 03 11:26:12 2020' (proftpd xferlog,
    #    datetime.rs:4189; upstart with TZ before year, :4014; apport
    #    mid-line, :3830)
    DTPD(
        name="ctime",
        regex=rf"(?:^|[^A-Za-z])(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) (?P<dt>{MONTHb} {DAYe} {HOUR}:{MIN}:{SEC}(?: {TZNAME})? {YEAR})(?:[^\d]|$)",
        slice_lo=0,
        slice_hi=96,
        prefilter="(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) ", prefilter_regex=True,
        test_cases=(
            ("Sat Oct 03 11:26:12 2020 0 192.168.0.8 0 /var/log/proftpd/xferlog b _ o r root ftp", 4, 24, "2020-10-03T11:26:12.000000", 0),
            ("Mon Dec 5 21:01:12 PST 2016 try umount root [1] times", 4, 27, "2016-12-06T05:01:12.000000", 0),
            ("ERROR: apport (pid 5009) Thu Aug  4 00:30:28 2022: called for pid 1549", 29, 49, "2022-08-04T00:30:28.000000", 0),
        ),
    ),
    # -- 'YYYY Mon DD H:M:S TZ' (logs/other/tests/dtf14a.log, datetime.rs:4217)
    DTPD(
        name="ymd_b_named_tz",
        regex=rf"^(?P<dt>{YEAR} {MONTHb} {DAYe} {HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?(?: {TZNAME})?)(?: |$)",
        slice_lo=0,
        slice_hi=40,
        test_cases=(
            ("2023 Aug 31 20:01:05 UTC [ERROR] dev-disk-a error 0x08320105", 0, 24, "2023-08-31T20:01:05.000000", 0),
        ),
    ),
    # -- NTP statistics files (loopstats/clockstats/peerstats): modified
    #    Julian day + seconds past midnight UTC (datetime.rs:3048-3100)
    DTPD(
        name="ntp_mjd",
        regex=r"^(?P<dt>(?P<mjd>\d{5}) (?P<sod_i>\d{1,5})\.(?P<sod_f>\d{1,6}))\s",
        slice_lo=0,
        slice_hi=16,
        mjd=True,
        test_cases=(
            ("59955 725.605 -0.002167105 47.876 0.012528010 1.558579 9", 0, 13, "2023-01-11T00:12:05.605000", 0),
        ),
    ),
    # -- Windows ReportingEvents.log: seconds-to-fractional divider is ':'
    #    (datetime.rs:4353-4375; the file itself is UTF-16 — Issue #16 —
    #    but the decoded shape is parseable here)
    DTPD(
        name="reporting_events",
        regex=rf"(?P<dt>{YEAR}-{MONTHm}-{DAY} {HOUR}:{MIN}:{SEC}:(?P<frac>\d{{3}}){TZNUM})",
        slice_lo=0,
        slice_hi=96,
        prefilter="-", 
        test_cases=(
            ("{5F45546A-691D-4519-810C-9B159EA7A24F}  2022-10-12 09:26:44:980-0700    1       181", 40, 68, "2022-10-12T16:26:44.980000", 0),
        ),
    ),
    # -- JSONL timestamp fields (datetime.rs:4376-4570)
    DTPD(
        name="jsonl_timestamp",
        regex=rf"\"(?:@?timestamp|time|datetime|date|ts)\"\s*:\s*\"(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?{TZNUM}?)\"",
        slice_lo=0,
        slice_hi=1024,
        prefilter="\"",
        test_cases=(
            ('{"level":"INFO","message":"Started","timestamp":"2024-04-08T21:55:48.726Z"}', 49, 73, "2024-04-08T21:55:48.726000", 0),
            ('{"ts": "2024-04-08 21:55:48"}', 8, 27, "2024-04-08T21:55:48.000000", 0),
        ),
    ),
    # -- Chrome cv_debug.log '"logTime": "MMDD/HHMMSS"' — no year
    #    (datetime.rs:4571-4589)
    DTPD(
        name="chrome_logtime",
        regex=r"\"logTime\":\s*\"(?P<dt>(?P<month>\d{2})(?P<day>\d{2})/(?P<hour>\d{2})(?P<minute>\d{2})(?P<second>\d{2}))\"",
        slice_lo=0,
        slice_hi=64,
        has_year=False,
        test_cases=(
            ('{"logTime": "0226/052726", "correlationVector":"C3BF38D097234ED3A46F33A1C497BF65"}', 13, 24, "1972-02-26T05:27:26.000000", 0),
        ),
    ),
    # -- '[LEVEL] Y-m-d H:M:S ±tz' (bracketed level word then rfc3339;
    #    reference family near datetime.rs:3030-3040)
    DTPD(
        name="level_rfc3339",
        regex=rf"^[\[\(]?(?:ERROR|WARNING|WARN|INFO|VERBOSE|TRACE|DEBUG|NOTICE|FATAL|CRITICAL|error|warning|warn|info|verbose|trace|debug|notice)[\]\)]?:? (?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?(?: ?{TZNUM})?)(?:[^\d]|$)",
        slice_lo=0,
        slice_hi=64,
        test_cases=(
            ("[ERROR] 2000-01-02 12:33:01 -1200 1", 8, 33, "2000-01-03T00:33:01.000000", 0),
            ("[VERBOSE] 2000-01-02T12:33:04 -1030 4444", 10, 35, "2000-01-02T23:03:04.000000", 0),
            ("INFO: 2021-03-04 05:06:07 service ready", 6, 25, "2021-03-04T05:06:07.000000", 0),
        ),
    ),
    # -- general unanchored fallbacks, first 1024 chars (datetime.rs:4590)
    DTPD(
        name="fallback_ymd_hms_tz",
        regex=rf"(?:^|[^\d])(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})? ?(?:{TZNUM}|{TZNAME}))(?:[^\d]|$)",
        slice_lo=0,
        slice_hi=1024,
        prefilter="-",
        test_cases=(("CONNECT at 2023-06-15 10:20:30 UTC done", 11, 34, "2023-06-15T10:20:30.000000", 0),),
    ),
    DTPD(
        name="fallback_ymd_hms",
        regex=rf"(?:^|[^\d])(?P<dt>{YEAR}-{MONTHm}-{DAY}[T ]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=1024,
        prefilter="-",
        test_cases=(("pid 42 started on 2021-07-04 12:00:01 ok", 18, 37, "2021-07-04T12:00:01.000000", 0),),
    ),
    DTPD(
        name="fallback_ymd_slash_hms",
        regex=rf"(?:^|[^\d])(?P<dt>{YEAR}/{MONTHm}/{DAY}[ T]{HOUR}:{MIN}:{SEC}(?:[\.,]{FRAC})?)",
        slice_lo=0,
        slice_hi=1024,
        prefilter="/",
        test_cases=(("session opened 2019/05/06 07:08:09 for user root", 15, 34, "2019-05-06T07:08:09.000000", 0),),
    ),
]

for _i, _p in enumerate(DATETIME_PARSE_DATAS):
    object.__setattr__(_p, "pattern_id", _i)  # stable ids = table index

PATTERN_BY_NAME = {p.name: p for p in DATETIME_PARSE_DATAS}

# dummy year for no-year formats (reference datetime.rs:146-155)
DUMMY_YEAR = 1972

MONTH3_TO_NUM = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def month_name_to_num(name: str) -> int | None:
    """Month name or 3-letter abbrev → number (reference
    month_bB_to_month_m_bytes, datetime.rs:5787)."""
    return MONTH3_TO_NUM.get(name[:3].lower())


def year2_to_year(yy: int) -> int:
    """chrono %y pivot: 00-68 → 20xx, 69-99 → 19xx."""
    return 2000 + yy if yy <= 68 else 1900 + yy
