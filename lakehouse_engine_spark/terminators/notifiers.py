"""Notification terminators — templated email notifications.

Reference parity: ``terminators/notifier.py``,
``terminators/notifiers/email_notifier.py``,
``terminators/notifiers/notification_templates.py`` and
``terminators/notifier_factory.py:9-80``. Semantics preserved:

* a notification spec is a ``TerminatorSpec(function="notify", args=...)``
  whose args carry ``type`` (dispatch key), either a ``template`` name or an
  explicit ``message``/``subject`` pair, the server/recipient fields, and
  arbitrary ``args`` used to render ``{{ placeholders }}``;
* templates live in a registry dict; the shipped
  ``failure_notification_email`` template is marked ``on_failure`` and is
  auto-attached to failing DataLoader runs
  (reference ``notifier_factory.py:34-80``);
* rendering is Jinja2 (same engine the reference uses for its notification
  fields and GAB SQL).

Portability: the reference resolves Databricks job name/workspace for its
runtime placeholders and sends via ``smtplib``. Neither exists in a plain
OSS deployment, so runtime placeholders resolve from the notification args
(falling back to env vars ``SPARK_APP_NAME``-style when present), and the
transport is injectable: pass ``transport=callable`` for tests/custom
delivery; with ``server`` set, a real ``smtplib.SMTP`` send is attempted;
otherwise the rendered notification is logged (driver-side only — this is
control-plane code, no executor involvement).
"""

from __future__ import annotations

import logging
import os
import smtplib
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Callable, Dict, List, Optional

from lakehouse_engine_spark.core.definitions import TerminatorSpec

_LOGGER = logging.getLogger(__name__)

# Template registry (reference ``notification_templates.py:4-16`` — the
# message body keeps the reference's exact newline/indent shape so
# rendered notifications compare byte-for-byte).
NOTIFICATION_TEMPLATES: Dict[str, Dict[str, Any]] = {
    "failure_notification_email": {
        "subject": "Service Failure",
        "mimetype": "text/text",
        "message": """
            Job {{ job_name }} in workspace {{ workspace_id }} has
            failed with the exception: {{ exception }}""",
        "on_failure": True,
    },
}


class NotifierConfigException(Exception):
    """Malformed notification definition."""


class NotifierTemplateNotFoundException(Exception):
    """Requested template does not exist."""


class NotifierTemplateConfigException(Exception):
    """Template rendering/config problem (reference
    ``terminators/notifiers/exceptions.py``)."""


class NotifierNotFoundException(Exception):
    """Requested notifier type is not supported."""


class Notifier:
    """Base notification class (reference ``terminators/notifier.py:20-90``)."""

    def __init__(self, notification_spec: TerminatorSpec):
        self.type = (notification_spec.args or {}).get("type")
        self.notification: Dict[str, Any] = dict(notification_spec.args or {})

    def create_notification(self) -> None:
        """Resolve template/message into the final rendered notification."""
        if "template" in self.notification:
            template = NOTIFICATION_TEMPLATES.get(self.notification["template"])
            if not template:
                raise NotifierTemplateNotFoundException(
                    f"Template {self.notification['template']} does not exist"
                )
            self.notification["message"] = self._render(template["message"])
            self.notification["subject"] = self._render(template["subject"])
            self.notification["mimetype"] = template["mimetype"]
        elif "message" in self.notification:
            self.notification["message"] = self._render(self.notification["message"])
            self.notification["subject"] = self._render(
                self.notification.get("subject", "")
            )
        else:
            raise NotifierConfigException("Malformed Notification Definition")

    def send_notification(self) -> None:
        raise NotImplementedError

    def _render(self, field: str) -> str:
        """Jinja2-render a notification field from ``args`` + runtime info.

        The reference injects Databricks job name/workspace
        (``notifier.py:43-68``); here those placeholders resolve from the
        notification args or environment, defaulting to the Spark app name.
        """
        from jinja2 import Template

        args = dict(self.notification.get("args") or {})
        args.setdefault("exception", self.notification.get("exception", ""))
        # the reference resolves these from the Databricks job context and
        # falls back to "local" outside one — same fallback here (env
        # overrides for OSS deployments that want real names)
        args.setdefault("job_name", os.environ.get("SPARK_APP_NAME", "local"))
        args.setdefault("workspace_id", os.environ.get("SPARK_WORKSPACE_ID", "local"))
        return Template(field).render(args)

    @staticmethod
    def check_if_notification_is_failure_notification(spec: TerminatorSpec) -> bool:
        """True when the spec's template is an ``on_failure`` template
        (reference ``notifier.py:70-90``)."""
        notification = spec.args or {}
        if "template" in notification:
            template = NOTIFICATION_TEMPLATES.get(notification["template"], {})
            return bool(template.get("on_failure", False))
        return False


Transport = Callable[[Dict[str, Any]], None]


class EmailNotifier(Notifier):
    """Email notification (reference ``notifiers/email_notifier.py:24-150``)."""

    def __init__(
        self,
        notification_spec: TerminatorSpec,
        transport: Optional[Transport] = None,
    ):
        super().__init__(notification_spec)
        self.transport = transport

    def send_notification(self) -> None:
        """Validate -> disallowed-server gate -> deliver. Reference
        ``email_notifier.py:68-180`` semantics, with the injectable
        ``transport`` kept as the test/custom-delivery seam (it replaces
        only the SMTP leg — validation and the disallowed-server gate
        still apply when a server is configured)."""
        if self.transport is not None:
            self._check_disallowed_server()
            self.transport(self.notification)
            return
        self._validate()
        self._check_disallowed_server()
        self._smtp_send(self.notification["server"])

    def _check_disallowed_server(self) -> None:
        from lakehouse_engine_spark.core.exec_env import ExecEnv

        server = self.notification.get("server")
        disallowed = getattr(
            ExecEnv.ENGINE_CONFIG, "notif_disallowed_email_servers", None
        )
        if server and disallowed and server in disallowed:
            raise NotifierConfigException(
                f"Trying to use disallowed smtp server: '{server}'.\n"
                f"Disallowed smtp servers: {str(disallowed)}"
            )

    def _validate(self) -> None:
        """Reference ``_validate_email_notification`` — exact messages."""
        if not self.notification.get("from"):
            raise NotifierConfigException(
                "Email notification must contain 'from' field."
            )
        if not self.notification.get("server"):
            raise NotifierConfigException(
                "Email notification must contain 'server' field."
            )
        if not self.notification.get("port"):
            raise NotifierConfigException(
                "Email notification must contain 'port' field."
            )
        if (
            not self.notification.get("to")
            and not self.notification.get("cc")
            and not self.notification.get("bcc")
        ):
            raise NotifierConfigException(
                "No recipients provided. Please provide at least one recipient."
            )

    def _build_mime(self) -> MIMEMultipart:
        from email.mime.application import MIMEApplication
        from posixpath import basename

        msg = MIMEMultipart()
        msg["From"] = self.notification.get("from", "")
        to = self.notification.get("to", []) or []
        cc = self.notification.get("cc", []) or []
        bcc = self.notification.get("bcc", []) or []
        msg["To"] = ", ".join(to)
        msg["CC"] = ", ".join(cc)
        msg["BCC"] = ", ".join(bcc)
        msg["Subject"] = self.notification.get("subject", "")
        msg["Importance"] = {
            "critical": "High", "high": "High", "low": "Low",
        }.get(str(self.notification.get("importance", "normal")), "Normal")
        # reference mimetype mapping (MIMEText subtype "text" emits the
        # Content-Type "text/text" its controls expect)
        raw = str(self.notification.get("mimetype", "plain"))
        if raw in ("html", "text/html"):
            subtype = "html"
        elif raw in ("text", "text/plain", "plain", "text/text"):
            subtype = "text"
        else:
            _LOGGER.warning(
                "Unknown mimetype %r provided. Defaulting to 'plain'.", raw
            )
            subtype = "text"
        msg.attach(MIMEText(self.notification.get("message", ""), subtype))
        for f in self.notification.get("attachments", []) or []:
            with open(f, "rb") as fil:
                part = MIMEApplication(fil.read(), Name=basename(f))
            part["Content-Disposition"] = (
                'attachment; filename="%s"' % basename(f)
            )
            msg.attach(part)
        return msg

    def _smtp_send(self, server: str) -> None:
        port = int(self.notification.get("port", 25))
        msg = self._build_mime()
        to = self.notification.get("to", []) or []
        cc = self.notification.get("cc", []) or []
        bcc = self.notification.get("bcc", []) or []
        with smtplib.SMTP(server, port) as smtp:
            # reference behavior: attempt TLS+auth, fall back to an
            # unauthenticated send when the server doesn't support them
            try:
                smtp.starttls()
                smtp.login(
                    self.notification.get("user", ""),
                    self.notification.get("password", ""),
                )
            except smtplib.SMTPException as e:
                _LOGGER.info(
                    "smtp auth unavailable (%s); sending unauthenticated", e
                )
            try:
                smtp.sendmail(
                    self.notification.get("from", ""),
                    to + cc + bcc,
                    msg.as_string(),
                )
                _LOGGER.info("Email sent successfully.")
            except smtplib.SMTPException as e:
                # reference behavior: a rejected send is logged, never
                # fails the pipeline (email_notifier.py:173-179)
                _LOGGER.exception("Exception while sending email: %s", e)


class NotifierFactory:
    """Notifier dispatch (reference ``terminators/notifier_factory.py:9-33``)."""

    NOTIFIER_TYPES = {"email": EmailNotifier}

    @classmethod
    def get_notifier(
        cls, spec: TerminatorSpec, transport: Optional[Transport] = None
    ) -> Notifier:
        notifier_name = (spec.args or {}).get("type")
        notifier = cls.NOTIFIER_TYPES.get(notifier_name)
        if notifier is None:
            raise NotifierNotFoundException(
                f"The requested notification format {notifier_name} is not supported."
            )
        return notifier(notification_spec=spec, transport=transport)

    @classmethod
    def generate_failure_notification(
        cls, specs: List[TerminatorSpec], exception: Exception
    ) -> None:
        """Send failure notifications for terminator specs that request them
        (reference ``notifier_factory.py:34-80``)."""
        for spec in specs or []:
            if spec.function != "notify":
                continue
            args = dict(spec.args or {})
            wants = args.get("generate_failure_notification", False) or (
                Notifier.check_if_notification_is_failure_notification(spec)
            )
            if not wants:
                continue
            args["exception"] = str(exception)
            if args.get("generate_failure_notification"):
                args.setdefault("template", "failure_notification_email")
            notifier = cls.get_notifier(TerminatorSpec(function="notify", args=args))
            notifier.create_notification()
            notifier.send_notification()
