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

# Template registry (reference ``notification_templates.py:4-16``).
NOTIFICATION_TEMPLATES: Dict[str, Dict[str, Any]] = {
    "failure_notification_email": {
        "subject": "Service Failure",
        "mimetype": "text/text",
        "message": (
            "Job {{ job_name }} in workspace {{ workspace_id }} has "
            "failed with the exception: {{ exception }}"
        ),
        "on_failure": True,
    },
}


class NotifierConfigException(Exception):
    """Malformed notification definition."""


class NotifierTemplateNotFoundException(Exception):
    """Requested template does not exist."""


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
        args.setdefault(
            "job_name", os.environ.get("SPARK_APP_NAME", "lakehouse_engine_spark")
        )
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
        self._validate()
        if self.transport is not None:
            self.transport(self.notification)
            return
        server = self.notification.get("server")
        if server:
            self._smtp_send(server)
        else:
            _LOGGER.warning(
                "NOTIFICATION (no transport/server configured): subject=%r to=%s\n%s",
                self.notification.get("subject"),
                self.notification.get("to"),
                self.notification.get("message"),
            )

    def _validate(self) -> None:
        missing = [
            f
            for f in ("from", "to")
            if f not in self.notification and self.notification.get("server")
        ]
        if missing:
            raise NotifierConfigException(
                f"Email notification missing fields: {missing}"
            )

    def _build_mime(self) -> MIMEMultipart:
        msg = MIMEMultipart()
        msg["From"] = self.notification.get("from", "")
        msg["To"] = ", ".join(self.notification.get("to", []))
        msg["Subject"] = self.notification.get("subject", "")
        subtype = "plain"
        if str(self.notification.get("mimetype", "")).endswith("html"):
            subtype = "html"
        msg.attach(MIMEText(self.notification.get("message", ""), subtype))
        return msg

    def _smtp_send(self, server: str) -> None:
        port = int(self.notification.get("port", 25))
        msg = self._build_mime()
        with smtplib.SMTP(server, port) as smtp:
            if self.notification.get("starttls", False):
                smtp.starttls()
            user = self.notification.get("user")
            if user:
                smtp.login(user, self.notification.get("password", ""))
            smtp.sendmail(
                self.notification.get("from", ""),
                self.notification.get("to", []),
                msg.as_string(),
            )


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
