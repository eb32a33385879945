"""Paginated REST API source (S4 + §2.8, SURVEY.md).

Reference: src/Sources/RestApi/RestApiSource.cs:35-517 plus the pagination /
URI / auth micro-operators under src/Sources/RestApi/Services/. The fetch
loop is inherently driver-side state (pagination cursors, token expiry, rate
limits); rows then enter Spark as a DataFrame per micro-batch, where all
heavy transformation happens distributed. For very large backfills the page
*range* can be parallelized by seeding multiple sources with disjoint date
ranges — pagination itself is sequential by nature (each page may depend on
the previous response).

Pagination strategies (reference PageResolvers, sequence goldens in
test/Sources/PageResolverTests.cs:104-170):

- ``PageCountingResolver`` — read total pages from the first response
- ``PageOffsetResolver``   — numeric offset advanced by response size
- ``PageNextTokenResolver`` — continuation token from the response body

Auth (reference FixedHeader / DynamicBearer providers):

- ``FixedHeaderAuth`` — static headers
- ``DynamicBearerAuth`` — fetch token, cache until expiry minus one minute
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def extract_by_key_chain(doc: Any, key_chain: list[str] | None) -> list:
    """Walk nested properties then enumerate the array (F4).

    Tolerant of missing keys — returns [] — matching
    RestApiExtensions.ParseResponse (RestApiExtensions.cs:37-52).
    """
    node = doc
    for key in key_chain or []:
        if not isinstance(node, dict) or key not in node:
            return []
        node = node[key]
    if node is None:
        return []
    return node if isinstance(node, list) else [node]


# ---------------------------------------------------------------------------
# Page resolvers (P1-P3)
# ---------------------------------------------------------------------------


class PageResolver:
    """Iteration state for one pagination scheme."""

    def next(self, response: Any | None) -> bool:
        """Advance using the latest response; False when no more pages."""
        raise NotImplementedError

    def current(self) -> str | None:
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError


class PageCountingResolver(PageResolver):
    """Total page count read from the first response (P1)."""

    def __init__(self, total_pages_key_chain: list[str], start_page: int = 1):
        self.key_chain = total_pages_key_chain
        self.start_page = start_page
        self.page: int | None = None
        self.total: int | None = None

    def next(self, response: Any | None) -> bool:
        if response is None:  # first call: emit the first page
            self.page, self.total = self.start_page, None
            return True
        if self.total is None:
            found = extract_by_key_chain(response, self.key_chain)
            self.total = int(found[0]) if found else 0
        if self.page is not None and self.page < self.total + self.start_page - 1:
            self.page += 1
            return True
        self.reset()
        return False

    def current(self) -> str | None:
        return None if self.page is None else str(self.page)

    def reset(self) -> None:
        self.page = None
        self.total = None


class PageOffsetResolver(PageResolver):
    """Numeric offset advanced by a fixed configured page size (P2).

    Reference parity (PageOffsetResolver.cs:31-59): the offset advances by
    the *configured* ``response_size`` after every non-empty response — NOT
    by the number of rows the page happened to contain — so APIs that return
    short non-final pages follow the same offset sequence as the reference.
    ``response_size=None`` keeps the advance-by-rows-returned behavior as an
    explicitly-documented divergence for APIs with unknown page size.
    """

    def __init__(self, response_size_key_chain: list[str] | None,
                 start_offset: int = 0,
                 response_size: int | None = None):
        if response_size is not None and response_size < 1:
            # 0 would never advance the offset: the driver loop would
            # refetch the same non-empty page forever.
            raise ValueError(
                f"response_size must be >= 1, got {response_size}"
            )
        self.key_chain = response_size_key_chain
        self.start_offset = start_offset
        self.response_size = response_size
        self.offset: int | None = None

    def next(self, response: Any | None) -> bool:
        if response is None:
            self.offset = self.start_offset
            return True
        rows = extract_by_key_chain(response, self.key_chain)
        if len(rows) == 0:
            self.reset()
            return False
        step = self.response_size if self.response_size is not None else len(rows)
        self.offset = (self.offset or 0) + step
        return True

    def current(self) -> str | None:
        return None if self.offset is None else str(self.offset)

    def reset(self) -> None:
        self.offset = None


class PageNextTokenResolver(PageResolver):
    """Continuation token from the response; stop on null/missing (P3)."""

    def __init__(self, token_key_chain: list[str]):
        self.key_chain = token_key_chain
        self.token: str | None = None
        self._started = False

    def next(self, response: Any | None) -> bool:
        if response is None:
            self._started, self.token = True, None
            return True
        found = extract_by_key_chain(response, self.key_chain)
        token = found[0] if found else None
        if token in (None, ""):
            self.reset()
            return False
        self.token = str(token)
        return True

    def current(self) -> str | None:
        return self.token

    def reset(self) -> None:
        self.token = None
        self._started = False


def page_resolver_from_config(config) -> PageResolver:
    """Resolver from a spec-declared ``PageResolverConfiguration`` — the
    repo's counterpart of ``PagedUriProvider.WithPageResolver``
    (reference PagedUriProvider.cs:155-178):

    - ``COUNTER`` → :class:`PageCountingResolver` over the key chain
    - ``OFFSET``  → :class:`PageOffsetResolver`; ``responseSize`` is
      REQUIRED (the reference's ApplicationException, cs:163-167)
    - ``TOKEN``   → :class:`PageNextTokenResolver` over the key chain

    Accepts the ``plans.spec.PageResolverConfiguration`` dataclass or the
    raw spec JSON dict (property names per
    PageResolverConfiguration.cs:9-44).
    """
    from arcane_framework_spark.plans.spec import PageResolverConfiguration

    if isinstance(config, dict):
        config = PageResolverConfiguration.from_dict(config)
    chain = list(config.resolver_property_key_chain)
    if config.resolver_type == "COUNTER":
        return PageCountingResolver(chain)
    if config.resolver_type == "OFFSET":
        if config.response_size is None:
            raise ValueError("Response size is required when using OFFSET")
        return PageOffsetResolver(
            chain,
            start_offset=config.start_offset or 0,
            response_size=config.response_size,
        )
    if config.resolver_type == "TOKEN":
        return PageNextTokenResolver(chain)
    raise ValueError(f"unknown resolverType {config.resolver_type!r}")


# ---------------------------------------------------------------------------
# URL templating + URI providers (F8, P4, P5)
# ---------------------------------------------------------------------------


class TemplatedFieldType:
    """Template field kinds (reference: RestApi/Models/TemplatedFieldType.cs)."""

    RESPONSE_PAGE = "RESPONSE_PAGE"
    FILTER_DATE_FROM = "FILTER_DATE_FROM"
    FILTER_DATE_BETWEEN_FROM = "FILTER_DATE_BETWEEN_FROM"
    FILTER_DATE_BETWEEN_TO = "FILTER_DATE_BETWEEN_TO"


class TemplatedFieldPlacement:
    """Template field placements (reference: TemplatedFieldPlacement.cs)."""

    URL = "URL"
    BODY = "BODY"


@dataclass(frozen=True)
class RestApiTemplatedField:
    """A declared template field: kind + name + format + placement.

    Mirrors the reference's configuration record
    (RestApi/Models/RestApiTemplatedField.cs): the URI providers select
    fields out of this list BY TYPE — first FILTER_DATE_FROM /
    FILTER_DATE_BETWEEN_FROM fills the range start, first
    FILTER_DATE_BETWEEN_TO the range end, RESPONSE_PAGE the page slot
    (SimpleUriProvider.cs:70, PagedUriProvider.cs:74-111) — rather than
    by positional constructor argument. ``format_string`` is a Python
    ``strftime`` pattern (the reference uses .NET format strings; the
    semantics — per-field date rendering — are the same).
    """

    field_type: str
    field_name: str
    format_string: str = "%Y-%m-%dT%H:%M:%S"
    placement: str = TemplatedFieldPlacement.URL


def _first_field(fields: list["RestApiTemplatedField"],
                 *types: str) -> "RestApiTemplatedField | None":
    """FirstOrDefault over field types, in declaration order."""
    return next((f for f in fields if f.field_type in types), None)


def sub_placeholder(template: str, name: str, value: str) -> str:
    """Replace ``@name`` in ``template`` with ``value`` at NAME
    BOUNDARIES only: ``@to`` must never capture the prefix of ``@token``
    (round-13 verdict #4 — a plain ``str.replace`` corrupts any longer
    placeholder the slot is a prefix of, regardless of substitution
    order when the names come from user specs). A placeholder ends
    where its identifier characters do, so the pattern is
    ``@name(?![A-Za-z0-9_])``; the replacement goes through a lambda so
    backslashes/group refs in ``value`` stay literal."""
    import re

    return re.sub(
        f"@{re.escape(name)}(?![A-Za-z0-9_])", lambda _m: str(value),
        template,
    )


class RestApiTemplate:
    """``@field`` placeholder substitution in a URL/body template.

    Mirrors RestApiTemplate.ResolveField (reference
    src/Sources/RestApi/Services/RestApiTemplate.cs:60-103): each declared
    field name ``x`` is substituted wherever ``@x`` appears; undeclared
    placeholders are left intact; ``resolve`` returns the rendered string
    once every declared field has a value.
    """

    def __init__(self, template: str, field_names: list[str]):
        self.template = template
        self.field_names = list(field_names)
        self._values: dict[str, str] = {}

    def resolve_field(self, name: str, value: str) -> "RestApiTemplate":
        if name in self.field_names:
            self._values[name] = value
        return self

    def resolve(self) -> str:
        out = self.template
        # Boundary-aware substitution: longest-first alone protects only
        # DECLARED names from each other — a declared @to would still
        # corrupt an UNDECLARED @token left in the template. The
        # name-boundary pattern protects both (resolving an unvalued
        # field to itself stays a no-op).
        for name in sorted(self.field_names, key=len, reverse=True):
            out = sub_placeholder(
                out, name, self._values.get(name, f"@{name}")
            )
        return out

    def reset(self) -> "RestApiTemplate":
        self._values.clear()
        return self


def _check_placement(placement: str) -> str:
    """Reject unknown placements loudly (the reference's
    ``ArgumentOutOfRangeException`` default switch arm)."""
    if placement not in (TemplatedFieldPlacement.URL,
                         TemplatedFieldPlacement.BODY):
        raise ValueError(f"unknown templated-field placement: {placement!r}")
    return placement


class SimpleUriProvider:
    """Non-paginated URL with an optional date filter (P4).

    Date filter value (reference SimpleUriProvider.cs:62-67):
    - backfilling → ``backfill_start``
    - first stream sweep → ``now - look_back``
    - steady state → ``now - change_capture_interval``

    ``date_field=None`` means no date filter is declared — the template
    resolves as-is (the reference's ``FirstOrDefault`` + null-pattern
    silently skips an absent date field; only PagedUriProvider's missing
    PAGE field throws). A ``BODY``-placed date field resolves into
    ``body_template`` instead of the URL (SimpleUriProvider.cs:76-86);
    ``next_request`` returns ``(url, payload_or_None)``.
    """

    def __init__(self, template: str, date_field: str | None,
                 backfill_start: datetime,
                 look_back: timedelta = timedelta(days=1),
                 change_capture_interval: timedelta = timedelta(seconds=15),
                 is_backfilling: bool = False,
                 date_format: str = "%Y-%m-%dT%H:%M:%S",
                 clock: Callable[[], datetime] | None = None,
                 body_template: str | None = None,
                 date_placement: str = TemplatedFieldPlacement.URL):
        names = [date_field] if date_field is not None else []
        self.template = RestApiTemplate(template, names)
        self.body_template = (
            RestApiTemplate(body_template, names)
            if body_template is not None else None
        )
        self.date_field = date_field
        self.date_placement = _check_placement(date_placement)
        if (date_field is not None
                and date_placement == TemplatedFieldPlacement.BODY
                and self.body_template is None):
            # stricter than the reference (which resolves into an Empty
            # template, silently sending no filter at all): an unusable
            # declaration fails at construction, not as an unbounded query
            raise ValueError(
                f"field {date_field!r} is BODY-placed but no body_template "
                "was given — the filter would be silently dropped"
            )
        self.backfill_start = backfill_start
        self.look_back = look_back
        self.change_capture_interval = change_capture_interval
        self.is_backfilling = is_backfilling
        self.date_format = date_format
        self.clock = clock or (lambda: datetime.now(timezone.utc))
        self._first_sweep = True

    @classmethod
    def from_templated_fields(cls, template: str,
                              fields: list[RestApiTemplatedField],
                              backfill_start: datetime,
                              **kwargs) -> "SimpleUriProvider":
        """Build from a declared field list, selecting the date filter BY
        TYPE exactly as the reference does (SimpleUriProvider.cs:70: first
        field whose type is FILTER_DATE_FROM or FILTER_DATE_BETWEEN_FROM;
        ``FirstOrDefault`` — an absent date field is silently skipped, not
        an error); the field's own format_string and placement win over
        any kwargs.
        """
        date = _first_field(
            fields,
            TemplatedFieldType.FILTER_DATE_FROM,
            TemplatedFieldType.FILTER_DATE_BETWEEN_FROM,
        )
        if date is None:
            return cls(template, None, backfill_start, **kwargs)
        kwargs["date_format"] = date.format_string
        kwargs["date_placement"] = date.placement
        return cls(template, date.field_name, backfill_start, **kwargs)

    def next_request(self, page_token: str | None = None) -> tuple[str, str | None]:
        """(url, body payload or None) — each field rendered into the
        template its declared placement selects."""
        if self.is_backfilling:
            start = self.backfill_start
        elif self._first_sweep:
            start = self.clock() - self.look_back
        else:
            start = self.clock() - self.change_capture_interval
        self._first_sweep = False
        url = self.template.reset()
        body = self.body_template.reset() if self.body_template else None
        if self.date_field is not None:
            value = start.strftime(self.date_format)
            if self.date_placement == TemplatedFieldPlacement.URL:
                url.resolve_field(self.date_field, value)
            elif body is not None:
                body.resolve_field(self.date_field, value)
        return url.resolve(), (body.resolve() if body is not None else None)

    def next_uri(self, page_token: str | None = None) -> str:
        return self.next_request(page_token)[0]


class PagedUriProvider:
    """Date-range + page templating (P5).

    Sweeps ``[range_start, range_end)`` in ``range_step`` slices; within each
    slice the page token fills ``page_field``. ``has_read_all_pages`` flips
    when the full range is consumed; ``reset_range`` starts a new sweep
    (reference PagedUriProvider.cs:16-181).
    """

    def __init__(self, template: str, page_field: str,
                 date_from_field: str | None, date_to_field: str | None,
                 range_start: datetime, range_end: datetime,
                 range_step: timedelta = timedelta(days=1),
                 date_format: str = "%Y-%m-%dT%H:%M:%S",
                 date_to_format: str | None = None,
                 body_template: str | None = None,
                 placements: dict[str, str] | None = None):
        fields = [
            f for f in (page_field, date_from_field, date_to_field)
            if f is not None
        ]
        self.template = RestApiTemplate(template, fields)
        self.body_template = (
            RestApiTemplate(body_template, fields)
            if body_template is not None else None
        )
        self.page_field = page_field
        self.date_from_field = date_from_field
        self.date_to_field = date_to_field
        # per-field URL/BODY routing (reference PagedUriProvider.cs:77-106,
        # 126-134); default everything to URL
        self.placements = {
            f: _check_placement((placements or {}).get(
                f, TemplatedFieldPlacement.URL))
            for f in fields
        }
        body_placed = [
            f for f, p in self.placements.items()
            if p == TemplatedFieldPlacement.BODY
        ]
        if body_placed and self.body_template is None:
            # see SimpleUriProvider: unusable declarations fail loudly
            raise ValueError(
                f"fields {body_placed} are BODY-placed but no "
                "body_template was given — they would be silently dropped"
            )
        self.range_start = range_start
        self.range_end = range_end
        self.range_step = range_step
        self.date_format = date_format
        # the reference renders each field with ITS OWN format string
        # (PagedUriProvider.cs:80,98); to-field falls back to from-format
        self.date_to_format = date_to_format or date_format
        self._cursor = range_start

    @classmethod
    def from_templated_fields(cls, template: str,
                              fields: list[RestApiTemplatedField],
                              range_start: datetime, range_end: datetime,
                              **kwargs) -> "PagedUriProvider":
        """Build from a declared field list, selecting BY TYPE exactly as
        the reference does (PagedUriProvider.cs:74-111): first
        FILTER_DATE_FROM/FILTER_DATE_BETWEEN_FROM -> range start, first
        FILTER_DATE_BETWEEN_TO -> range end, RESPONSE_PAGE -> page slot —
        raising the reference's error ONLY when a paged API declares no
        page field (PagedUriProvider.cs:113-117); absent date fields are
        silently skipped (``FirstOrDefault`` + null pattern, cs:73,92).
        Each date field renders with its own format_string, and each
        field's declared placement routes it to the URL or body template.
        """
        page = _first_field(fields, TemplatedFieldType.RESPONSE_PAGE)
        if page is None:
            raise ValueError(
                "No field in either body or request url has a `page` "
                "parameter, though API is initialized as paged"
            )
        dfrom = _first_field(
            fields,
            TemplatedFieldType.FILTER_DATE_FROM,
            TemplatedFieldType.FILTER_DATE_BETWEEN_FROM,
        )
        dto = _first_field(fields, TemplatedFieldType.FILTER_DATE_BETWEEN_TO)
        placements = {page.field_name: page.placement}
        if dfrom is not None:
            kwargs["date_format"] = dfrom.format_string
            placements[dfrom.field_name] = dfrom.placement
        if dto is not None:
            kwargs["date_to_format"] = dto.format_string
            placements[dto.field_name] = dto.placement
        kwargs.setdefault("placements", placements)
        return cls(template, page.field_name,
                   dfrom.field_name if dfrom is not None else None,
                   dto.field_name if dto is not None else None,
                   range_start, range_end, **kwargs)

    def has_read_all_pages(self) -> bool:
        return self._cursor >= self.range_end

    def advance_range(self) -> None:
        self._cursor = min(self._cursor + self.range_step, self.range_end)

    def reset_range(self) -> None:
        self._cursor = self.range_start

    def next_request(self, page_token: str | None) -> tuple[str, str | None]:
        """(url, body payload or None) — each declared field rendered into
        the template its placement selects."""
        slice_from = self._cursor
        slice_to = min(slice_from + self.range_step, self.range_end)
        url = self.template.reset()
        body = self.body_template.reset() if self.body_template else None
        values = [(self.page_field, str(page_token or 1))]
        if self.date_from_field is not None:
            values.append(
                (self.date_from_field, slice_from.strftime(self.date_format))
            )
        if self.date_to_field is not None:
            values.append(
                (self.date_to_field, slice_to.strftime(self.date_to_format))
            )
        for name, value in values:
            if self.placements[name] == TemplatedFieldPlacement.URL:
                url.resolve_field(name, value)
            elif body is not None:
                body.resolve_field(name, value)
        return url.resolve(), (body.resolve() if body is not None else None)

    def next_uri(self, page_token: str | None) -> str:
        return self.next_request(page_token)[0]


# ---------------------------------------------------------------------------
# Auth providers (P6/P7)
# ---------------------------------------------------------------------------


class FixedHeaderAuth:
    """Static headers (FixedHeaderAuthenticatedMessageProvider)."""

    def __init__(self, headers: dict[str, str] | None = None):
        self.headers = headers or {}

    def get_headers(self) -> dict[str, str]:
        return dict(self.headers)


class DynamicBearerAuth:
    """Token fetch + cache until expiry−1min (DynamicBearerAuthenticatedMessageProvider).

    ``token_fetcher`` returns ``(token, expires_in_seconds)`` — injected so
    tests (and different auth endpoints) can supply their own transport.
    """

    def __init__(self, token_fetcher: Callable[[], tuple[str, float]],
                 header: str = "Authorization", scheme: str = "Bearer"):
        self.token_fetcher = token_fetcher
        self.header = header
        self.scheme = scheme
        self._token: str | None = None
        self._valid_until: datetime | None = None

    @classmethod
    def from_spec(cls, opts: dict, timeout_seconds: float = 30.0,
                  http_send=None) -> "DynamicBearerAuth":
        """Token fetch built entirely from spec JSON — the reference's
        config surface (DynamicBearerAuthenticatedMessageProvider.cs:
        tokenSource/tokenPropertyName/expirationPeriodPropertyName/
        requestMethod/tokenRequestBody/tokenRequestContentType/
        authHeaderName/authScheme/additionalHeaders). Keys here:

        - ``tokenUrl`` (required), ``tokenProperty`` (required)
        - ``expiresInProperty`` — read token lifetime from the response;
          else ``expirationSeconds`` (fixed period, default 3600)
        - ``method`` (default GET; POST when a body is declared),
          ``body``, ``contentType`` (json default; form-urlencoded
          re-encodes the JSON body's key/value pairs, the reference's
          FormUrlEncodedContent arm; anything else raises)
        - ``headerName`` / ``scheme`` — a non-Authorization header
          carries the RAW token (no scheme), like the reference
        - ``additionalHeaders`` for the token request itself

        ``http_send(method, url, body_bytes, headers, timeout)`` is the
        injectable transport for tests; defaults to urllib.
        """
        token_url = opts["tokenUrl"]
        token_prop = opts["tokenProperty"]

        def fetch() -> tuple[str, float]:
            headers = dict(opts.get("additionalHeaders") or {})
            body = opts.get("body")
            data = None
            if body:
                ctype = opts.get("contentType", "application/json")
                if ctype == "application/json":
                    data = body.encode("utf-8")
                elif ctype == "application/x-www-form-urlencoded":
                    import urllib.parse as _parse
                    data = _parse.urlencode(json.loads(body)).encode("utf-8")
                else:
                    raise ValueError(
                        f"Unsupported content type for authentication: "
                        f"{ctype}"
                    )
                headers["Content-Type"] = ctype
            method = str(
                opts.get("method", "GET" if data is None else "POST")
            ).upper()
            if http_send is not None:
                status, text = http_send(
                    method, token_url, data, headers, timeout_seconds
                )
                if not 200 <= status < 300:
                    raise RuntimeError(f"token endpoint HTTP {status}")
            else:
                req = urllib.request.Request(
                    token_url, data=data, headers=headers, method=method
                )
                with urllib.request.urlopen(
                    req, timeout=timeout_seconds
                ) as resp:
                    text = resp.read().decode("utf-8")
            doc = json.loads(text)
            token = str(doc[token_prop])
            if opts.get("expiresInProperty"):
                expires = float(doc[opts["expiresInProperty"]])
            else:
                expires = float(opts.get("expirationSeconds", 3600))
            return token, expires

        header = opts.get("headerName") or "Authorization"
        if header == "Authorization":
            scheme = opts.get("scheme", "Bearer")
        else:
            # the reference's custom-header arm still sends
            # "{scheme} {token}" when a scheme is declared
            # (DynamicBearerAuthenticatedMessageProvider.cs GetRequest);
            # only an absent/empty scheme means the raw token
            scheme = opts.get("scheme") or ""
        return cls(fetch, header=header, scheme=scheme)

    def get_headers(self) -> dict[str, str]:
        now = datetime.now(timezone.utc)
        if self._token is None or (self._valid_until and now >= self._valid_until):
            token, expires_in = self.token_fetcher()
            self._token = token
            self._valid_until = now + timedelta(seconds=expires_in) - timedelta(
                minutes=1
            )
        value = f"{self.scheme} {self._token}".strip()
        return {self.header: value}


# ---------------------------------------------------------------------------
# Rate limiting (T5)
# ---------------------------------------------------------------------------


class TokenBucketRateLimiter:
    """``rate`` requests per ``per_seconds``, blocking acquire."""

    def __init__(self, rate: int, per_seconds: float = 1.0,
                 clock: Callable[[], float] = time.monotonic,
                 sleeper: Callable[[float], None] = time.sleep):
        self.rate = rate
        self.per_seconds = per_seconds
        self.clock = clock
        self.sleeper = sleeper
        self.tokens = float(rate)
        self.updated = clock()

    def acquire(self) -> None:
        while True:
            now = self.clock()
            self.tokens = min(
                self.rate, self.tokens + (now - self.updated) * self.rate / self.per_seconds
            )
            self.updated = now
            if self.tokens >= 1:
                self.tokens -= 1
                return
            self.sleeper((1 - self.tokens) * self.per_seconds / self.rate)


# ---------------------------------------------------------------------------
# The source
# ---------------------------------------------------------------------------


@dataclass
class RestApiSource:
    """Driver-side fetch loop feeding Spark micro-batches.

    ``url_builder(page_token)`` renders the request URL for the current page
    (covers the reference's templated URI providers P4/P5);
    ``response_key_chain`` locates the row array in the response body.
    """

    spark: SparkSession
    url_builder: Callable[[str | None], str]
    schema: T.StructType
    page_resolver: PageResolver = field(default_factory=lambda: _OnePage())
    auth: FixedHeaderAuth | DynamicBearerAuth = field(default_factory=FixedHeaderAuth)
    rate_limiter: TokenBucketRateLimiter | None = None
    #: HTTP method + optional request builder returning (url, payload) —
    #: the reference's GetNextResultUri returns (uri, requestMethod,
    #: payload) and the fetch loop sends all three
    #: (SimpleUriProvider.cs:48-56, RestApiSource.cs request issue path).
    #: When ``request_builder`` is set it wins over ``url_builder`` and
    #: BODY-placed templated fields actually travel with the request.
    http_method: str = "GET"
    request_builder: Callable[[str | None], tuple[str, str | None]] | None = None
    response_key_chain: list[str] | None = None
    timeout_seconds: float = 30.0
    #: HTTP transport — injectable for tests; defaults to urllib.
    http_get: Callable[[str, dict[str, str], float], tuple[int, str]] | None = None

    #: Transient-retry knobs (C11): the reference restarts the fetch with a
    #: 1 s backoff on timeout/IO errors (RestApiSource.cs:355-361,404-415).
    max_retry_attempts: int = 3
    retry_backoff_seconds: float = 1.0
    retry_sleep: Callable[[float], None] | None = None

    def _get(self, url: str, body: str | None = None) -> tuple[int, str]:
        from arcane_framework_spark.streaming.retry import with_retry

        def once() -> tuple[int, str]:
            if self.http_get is not None:
                if body is not None:
                    # a payload-bearing request needs a transport that
                    # accepts a 4th argument — fail with the contract, not
                    # a bare TypeError mid-sweep. Variadic (*args/**kw) and
                    # uninspectable transports are assumed capable: a
                    # functools.partial or def f(*args) wrapper that
                    # happily takes a body must not be rejected by a named-
                    # parameter count (round-11 ADVICE).
                    import inspect

                    try:
                        params = list(
                            inspect.signature(self.http_get).parameters.values()
                        )
                    except (TypeError, ValueError):
                        params = None  # C callable etc.: let the call decide
                    if params is not None:
                        positional = sum(
                            p.kind in (p.POSITIONAL_ONLY,
                                       p.POSITIONAL_OR_KEYWORD)
                            for p in params
                        )
                        variadic = any(
                            p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
                            for p in params
                        )
                        if positional < 4 and not variadic:
                            raise TypeError(
                                "injected http_get takes no payload; a "
                                "source with request_builder/bodyTemplate "
                                "needs http_get(url, headers, timeout, body)"
                            )
                    return self.http_get(
                        url, self.auth.get_headers(), self.timeout_seconds,
                        body,
                    )
                return self.http_get(
                    url, self.auth.get_headers(), self.timeout_seconds
                )
            headers = self.auth.get_headers()
            data = None
            if body is not None:
                data = body.encode("utf-8")
                headers.setdefault("Content-Type", "application/json")
            # the declared method is honored even for body-less requests
            # (a spec may say POST with an empty body); None would make
            # urllib silently fall back to GET
            req = urllib.request.Request(
                url, data=data, headers=headers, method=self.http_method
            )
            with urllib.request.urlopen(req, timeout=self.timeout_seconds) as resp:
                return resp.status, resp.read().decode("utf-8")

        kwargs = {} if self.retry_sleep is None else {"sleep": self.retry_sleep}
        return with_retry(
            once,
            max_attempts=self.max_retry_attempts,
            backoff_seconds=self.retry_backoff_seconds,
            **kwargs,
        )

    def fetch_pages(self) -> Iterator[list[dict]]:
        """Iterate pages until the resolver is exhausted.

        429/408 responses yield an empty batch and stop the sweep (retried
        next trigger), matching RestApiSource.cs:503-515; other non-2xx raise.
        """
        response: Any | None = None
        while self.page_resolver.next(response):
            if self.rate_limiter is not None:
                self.rate_limiter.acquire()
            token = self.page_resolver.current()
            if self.request_builder is not None:
                url, payload = self.request_builder(token)
            else:
                url, payload = self.url_builder(token), None
            status, body = self._get(url, payload)
            if status in (408, 429):
                yield []
                return
            if not 200 <= status < 300:
                raise RuntimeError(f"REST source HTTP {status} for {url}")
            response = json.loads(body) if body else {}
            yield [
                row if isinstance(row, dict) else {"value": row}
                for row in extract_by_key_chain(response, self.response_key_chain)
            ]

    def fetch_batch(self) -> DataFrame:
        """One full pagination sweep → one DataFrame (one micro-batch)."""
        rows: list[dict] = []
        for page in self.fetch_pages():
            rows.extend(page)
        return self.spark.createDataFrame(rows, self.schema)


def templated_fields_from_spec(payload: list[dict]) -> list[RestApiTemplatedField]:
    """Spec-JSON field list → typed fields (property names per the
    reference's RestApiTemplatedField.cs: ``fieldType``/``fieldName``/
    ``formatString``/``placement``; format strings here are Python
    ``strftime`` patterns)."""
    out = []
    for f in payload or []:
        kwargs = {}
        if f.get("formatString"):
            kwargs["format_string"] = f["formatString"]
        if f.get("placement"):
            kwargs["placement"] = str(f["placement"]).upper()
        out.append(RestApiTemplatedField(
            str(f["fieldType"]).upper(), f["fieldName"], **kwargs
        ))
    return out


def rest_source_from_spec(spark: SparkSession, spec,
                          schema: T.StructType | None = None,
                          clock: Callable[[], datetime] | None = None,
                          http_get=None,
                          token_http_send=None) -> "RestApiSource":
    """A paginated REST pipeline built ENTIRELY from the stream spec —
    the missing half of the reference's declarative surface: its stream
    plugins deserialize ``PageResolverConfiguration`` and the templated
    field list straight out of ``STREAMCONTEXT__SPEC`` JSON
    (PageResolverConfiguration.cs:9-44, RestApiTemplatedField.cs:9-35),
    so a paginated source needs no code, only config. Spec ``options``:

    - ``urlTemplate`` (required), ``bodyTemplate``
    - ``templatedFields``: list of {fieldType, fieldName, formatString,
      placement}
    - ``responsePropertyKeyChain``: where the row array lives (F4)
    - ``schemaDdl`` (unless ``schema`` is passed) or ``openApiSchema``
      (an OpenAPI fragment, F7)
    - ``headers``: static auth headers (P6)
    - ``rateLimitRequests`` / ``rateLimitPerSeconds`` (T5)
    - ``backfillStartUnixMillis``; paged ranges:
      ``rangeStartUnixMillis`` / ``rangeEndUnixMillis`` /
      ``rangeStepSeconds``

    Pagination comes from ``spec.page_resolver`` (the spec's
    ``pageResolver`` object): present → :class:`PagedUriProvider` + the
    configured resolver; absent → :class:`SimpleUriProvider`, one request
    per sweep. Backfill/lookback/interval timing flows from the spec's
    own fields, so ``STREAMCONTEXT__BACKFILL`` flips the provider exactly
    like the reference's IsBackfilling context flag.
    """
    from datetime import timezone as _tz

    opts = spec.options
    template = opts["urlTemplate"]
    fields = templated_fields_from_spec(opts.get("templatedFields"))
    if schema is None:
        if opts.get("schemaDdl"):
            schema = T.StructType.fromDDL(opts["schemaDdl"])
        elif opts.get("openApiSchema"):
            from arcane_framework_spark.contracts.openapi import (
                parse_openapi_schema,
            )
            schema = parse_openapi_schema(opts["openApiSchema"])
        else:
            raise ValueError(
                "spec options need schemaDdl or openApiSchema "
                "(or pass schema= explicitly)"
            )

    def millis(key: str, default: datetime) -> datetime:
        from arcane_framework_spark.plans.spec import parse_unix_millis
        raw = opts.get(key)
        return default if raw is None else parse_unix_millis(raw)

    epoch = datetime(1970, 1, 1, tzinfo=_tz.utc)
    now = (clock or (lambda: datetime.now(_tz.utc)))()
    common = dict(body_template=opts.get("bodyTemplate"))
    if spec.page_resolver is not None:
        start = millis("rangeStartUnixMillis",
                       millis("backfillStartUnixMillis", epoch)
                       if spec.backfill else now - spec.lookback_range)
        end = millis("rangeEndUnixMillis", now)
        step = timedelta(seconds=float(opts.get("rangeStepSeconds", 86400)))
        provider = PagedUriProvider.from_templated_fields(
            template, fields, range_start=start, range_end=end,
            range_step=step, **common,
        )
        resolver: PageResolver = page_resolver_from_config(spec.page_resolver)
    else:
        provider = SimpleUriProvider.from_templated_fields(
            template, fields,
            backfill_start=millis("backfillStartUnixMillis", epoch),
            look_back=spec.lookback_range,
            change_capture_interval=spec.change_capture_interval,
            is_backfilling=spec.backfill,
            **(dict(common, clock=clock) if clock else common),
        )
        resolver = _OnePage()
    limiter = None
    if opts.get("rateLimitRequests"):
        limiter = TokenBucketRateLimiter(
            int(opts["rateLimitRequests"]),
            float(opts.get("rateLimitPerSeconds", 1.0)),
        )
    kwargs = {} if http_get is None else {"http_get": http_get}
    if opts.get("bodyTemplate"):
        # BODY-placed fields travel: request_builder carries the resolved
        # payload and the declared method (reference requestMethod)
        kwargs["request_builder"] = provider.next_request
        kwargs["http_method"] = str(opts.get("httpMethod", "POST")).upper()
    elif opts.get("httpMethod"):
        kwargs["http_method"] = str(opts["httpMethod"]).upper()
    auth: FixedHeaderAuth | DynamicBearerAuth
    if opts.get("bearerAuth"):
        # token_http_send: injectable token-endpoint transport (tests /
        # offline runs) — the data-request http_get does not cover it
        auth = DynamicBearerAuth.from_spec(
            opts["bearerAuth"], http_send=token_http_send
        )
    else:
        auth = FixedHeaderAuth(opts.get("headers"))
    return RestApiSource(
        spark=spark,
        url_builder=provider.next_uri,
        schema=schema,
        page_resolver=resolver,
        auth=auth,
        rate_limiter=limiter,
        response_key_chain=list(opts.get("responsePropertyKeyChain") or []),
        **kwargs,
    )


class _OnePage(PageResolver):
    """Non-paginated endpoint: exactly one request per sweep (P4)."""

    def __init__(self) -> None:
        self._done = False

    def next(self, response: Any | None) -> bool:
        if response is None and not self._done:
            self._done = True
            return True
        self._done = False
        return False

    def current(self) -> str | None:
        return None

    def reset(self) -> None:
        self._done = False
