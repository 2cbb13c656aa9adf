{{/*
Naming + label helpers. The standby StatefulSet is distinguished by an
app.kubernetes.io/component label rather than a parallel set of
name-suffixed helpers (same selectable surface as the reference's
binwatch.selectorLabelsReplica, one axis instead of two helper trees).
*/}}

{{- define "graft.name" -}}
{{- if .Values.nameOverride -}}{{ .Values.nameOverride }}{{- else -}}{{ .Chart.Name }}{{- end -}}
{{- end }}

{{- define "graft.fullname" -}}
{{- if .Values.fullnameOverride -}}{{ .Values.fullnameOverride }}{{- else -}}{{ .Release.Name }}-{{ include "graft.name" . }}{{- end -}}
{{- end }}

{{- define "graft.serviceAccountName" -}}
{{- if .Values.serviceAccount.create -}}
{{- if .Values.serviceAccount.name -}}{{ .Values.serviceAccount.name }}{{- else -}}{{ include "graft.fullname" . }}{{- end -}}
{{- else -}}
{{- if .Values.serviceAccount.name -}}{{ .Values.serviceAccount.name }}{{- else -}}default{{- end -}}
{{- end -}}
{{- end }}

{{- define "graft.selectorLabels" -}}
app.kubernetes.io/name: {{ include "graft.name" . }}
app.kubernetes.io/instance: {{ .Release.Name }}
app.kubernetes.io/component: primary
{{- end }}

{{- define "graft.selectorLabelsStandby" -}}
app.kubernetes.io/name: {{ include "graft.name" . }}
app.kubernetes.io/instance: {{ .Release.Name }}
app.kubernetes.io/component: standby
{{- end }}

{{- define "graft.labels" -}}
helm.sh/chart: {{ .Chart.Name }}-{{ .Chart.Version }}
app.kubernetes.io/version: {{ .Chart.AppVersion | quote }}
app.kubernetes.io/managed-by: {{ .Release.Service }}
{{ include "graft.selectorLabels" . }}
{{- end }}

{{- define "graft.labelsStandby" -}}
helm.sh/chart: {{ .Chart.Name }}-{{ .Chart.Version }}
app.kubernetes.io/version: {{ .Chart.AppVersion | quote }}
app.kubernetes.io/managed-by: {{ .Release.Service }}
{{ include "graft.selectorLabelsStandby" . }}
{{- end }}
